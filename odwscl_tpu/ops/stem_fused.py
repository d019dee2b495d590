"""Fused conv1_2 + ReLU + 2x2 maxpool for the VGG stem eval path.

Why: the stem is the least MXU-friendly part of the backbone (reference
vgg16.py:58-90 conv1 block; r3 profile: conv1_2 10.1 ms + pool1 ~2 ms of
the 58 ms backbone at the bench shape). XLA's lowering writes the
full-resolution 64-channel conv1_2 activations to HBM (1.43 GB) and reads
them back for the pool; here they never leave VMEM — the kernel reads
conv1_1's output once and writes only the pooled half-resolution output
(0.36 GB), computing the conv as tap-PAIR MXU dots ([M,128]@[128,64])
to double K-utilisation (a 64-channel conv can't fill the lane dim; K
pairing is the remaining lever).

Semantics are the direct conv's (SAME zero padding, bf16 multiply / f32
accumulate / bf16 bias+ReLU). Forward-only: the train path keeps XLA
convs for autodiff. Parity: tests/test_stem_fused.py (interpret mode) +
tools/bench_stem.py (hardware).

Halo handling without manual DMA (Mosaic forbids lane-misaligned HBM
slices, and BlockSpec blocks cannot overlap): the input is passed THREE
times — the 32-row mid block plus 2-row neighbor slivers above/below via
clamped index_maps — and stitched into a VMEM scratch with the SAME-pad
zero masking applied at the image edges.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_STRIP = 32            # conv output rows per grid step (pool rows = 16)
_VMEM_LIMIT = 100 * 1024 * 1024


def stem_fused_feasible(h: int, w: int) -> bool:
    """Strips must tile H; VMEM bounds W (scratch ~= (w/1344)*30 MB)."""
    return h % _STRIP == 0 and w % 2 == 0 and w <= 2048


def _kernel(h, w, mid_ref, up_ref, dn_ref, w2p_ref, b2_ref, out_ref,
            y1_scr, pair_scr):
    si = pl.program_id(1)
    n_strips = h // _STRIP

    # stitch [34, w+2, 64]: 1 halo row + 1 halo col each side, zeros at
    # image edges (conv SAME padding)
    zrow = jnp.zeros((1, w, 64), jnp.bfloat16)
    y1_scr[0:1, 1:w + 1, :] = jnp.where(si > 0, up_ref[0, 1:2], zrow)
    y1_scr[1:_STRIP + 1, 1:w + 1, :] = mid_ref[0]
    y1_scr[_STRIP + 1:, 1:w + 1, :] = jnp.where(si < n_strips - 1,
                                                dn_ref[0, 0:1], zrow)
    zcol = jnp.zeros((_STRIP + 2, 1, 64), jnp.bfloat16)
    y1_scr[:, 0:1, :] = zcol
    y1_scr[:, w + 1:, :] = zcol

    # conv1_2 as 5 tap-pair dots (taps dy-major; pair 4 is (8, zero-pad)).
    # Shifted slices carry mismatched sublane offsets, so each pair is
    # STORED into a packed scratch first (stores normalize layout; a
    # direct lane-concat trips Mosaic "offset mismatch on non-concat dim").
    acc = None
    for p in range(5):
        for slot in range(2):
            t = 2 * p + slot
            if t < 9:
                dy, dx = t // 3, t % 3
                pair_scr[:, :, slot * 64:(slot + 1) * 64] = (
                    y1_scr[dy:dy + _STRIP, dx:dx + w, :])
            else:
                pair_scr[:, :, 64:] = jnp.zeros((_STRIP, w, 64),
                                                jnp.bfloat16)
        a = pair_scr[...].reshape(_STRIP * w, 128)
        d = jax.lax.dot_general(a, w2p_ref[p], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d

    y2 = jnp.maximum(acc.astype(jnp.bfloat16)
                     + b2_ref[...].astype(jnp.bfloat16), 0)
    y2 = y2.reshape(_STRIP, w, 64)
    # 2x2 maxpool: rows via major-dim split, cols via sublane-dim split
    y2 = y2.reshape(_STRIP // 2, 2, w, 64).max(axis=1)       # [16, w, 64]
    y2 = y2.reshape(_STRIP // 2, w // 2, 2, 64).max(axis=2)  # [16, w/2, 64]
    out_ref[0] = y2


def conv12_pool_fused(y1: jnp.ndarray, w2: jnp.ndarray, b2: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """y1 [B,H,W,64] (conv1_1+ReLU output) -> [B,H/2,W/2,64].

    Computes maxpool2x2(relu(conv_same_3x3(y1, w2) + b2)); w2 [3,3,64,64]
    HWIO.
    """
    b, h, w, cin = y1.shape
    assert cin == 64 and stem_fused_feasible(h, w), (h, w)
    y1 = y1.astype(jnp.bfloat16)
    # host-side tap pairs: [5, 128, 64], last pair zero-padded
    w2f = w2.reshape(9, 64, 64).astype(jnp.bfloat16)
    w2p = jnp.concatenate(
        [jnp.concatenate([w2f[2 * p],
                          w2f[2 * p + 1] if 2 * p + 1 < 9
                          else jnp.zeros((64, 64), jnp.bfloat16)],
                         axis=0)[None] for p in range(5)], axis=0)

    n2 = h // 2  # number of 2-row sliver blocks
    grid = (b, h // _STRIP)
    out = pl.pallas_call(
        functools.partial(_kernel, h, w),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _STRIP, w, 64),
                         lambda bi, si: (bi, si, 0, 0)),
            # rows 32si-2..32si-1 (clamped at the top edge, masked in-kernel)
            pl.BlockSpec((1, 2, w, 64),
                         lambda bi, si: (bi, jnp.maximum(
                             _STRIP // 2 * si - 1, 0), 0, 0)),
            # rows 32si+32..+33 (clamped at the bottom edge)
            pl.BlockSpec((1, 2, w, 64),
                         lambda bi, si, n2=n2: (bi, jnp.minimum(
                             _STRIP // 2 * (si + 1), n2 - 1), 0, 0)),
            pl.BlockSpec((5, 128, 64), lambda bi, si: (0, 0, 0)),
            pl.BlockSpec((64,), lambda bi, si: (0,)),
        ],
        out_specs=pl.BlockSpec((1, _STRIP // 2, w // 2, 64),
                               lambda bi, si: (bi, si, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w // 2, 64),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((_STRIP + 2, w + 2, 64), jnp.bfloat16),
            pltpu.VMEM((_STRIP, w, 128), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(y1, y1, y1, w2p, jnp.asarray(b2))
    return out
