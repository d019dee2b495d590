"""Winograd F(4x4, 3x3) transform constants + XLA reference implementation.

STATUS (CLOSED round 5, VERDICT r4 task 6): Winograd LOST to the shipped
alternatives on this hardware and is NOT on any product path. Measured
on v5e with chained timing (NOTES.md records the numbers): the fused
Pallas kernel ran 0.3-0.7x of XLA's direct bf16 conv (host view prep +
transform VMEM traffic ate the 4x FLOP cut) and the round-3 "v2"
phase-layout XLA variant 0.15-0.29x (XLA does not fuse the transform
chains). Both implementations are DELETED; the shipped conv-rate win is
int8 instead (ops/quant.py conv2d_int8: XLA int8 conv at 1.2-1.55x bf16
with a calibrated accuracy story). This module keeps only the F(4,3)
transform matrices and the straightforward XLA implementation as a
correctness oracle (tests/test_winograd.py) for any future retry.

Math background: Winograd F(4,3) computes each 4x4 output tile with 36
multiplies instead of 144 (4x fewer MXU FLOPs); the input/output
transforms are cheap VPU add/mul chains.

Math (Lavin & Gray, arXiv:1509.09308): Y = A^T [ (G g G^T) .* (B^T d B) ] A
per 6x6 input tile d (stride 4, pad 1). The elementwise product over
(6x6 transform positions) x (Cin) x (Cout) is a batch of 36 GEMMs
[N_tiles, Cin] @ [Cin, Cout] — MXU-shaped for Cin,Cout >= 128.

Precision: transforms run in f32 (exact for bf16 inputs; the B^T
coefficients are small ints/halves), the GEMM in bf16 with f32
accumulation — the same contract as XLA's direct bf16 conv. Max transform
coefficient magnitude is 5, so intermediate magnitudes grow by <~400x
across both transforms; bf16's dynamic range absorbs this and the
round-trip error stays within a few ULP of direct bf16 conv (tested in
tests/test_winograd.py against f32 direct conv).

The reference has no analogue (cuDNN chooses Winograd internally on V100/
A100 for these very layers — NVIDIA's cudnnConvolutionForward algo
CUDNN_CONVOLUTION_FWD_ALGO_WINOGRAD; this module is the explicit
TPU-native counterpart).

Dilation-2 convs (the OICR conv5 block, vgg16.py VGG_CFGS '512-D') are
handled by phase decomposition: a dilation-2 3x3 conv couples only cells
of equal (y%2, x%2) parity, so it is exactly 4 independent dense 3x3
convs on the parity subgrids, each Winograd-eligible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# F(4x4, 3x3) transform matrices (Lavin & Gray; NNPACK/cuDNN convention).
_BT = np.array([
    [4, 0, -5, 0, 1, 0],
    [0, -4, -4, 1, 1, 0],
    [0, 4, -4, -1, 1, 0],
    [0, -2, -1, 2, 1, 0],
    [0, 2, -1, -2, 1, 0],
    [0, 4, 0, -5, 0, 1],
], np.float32)
_G = np.array([
    [1 / 4, 0, 0],
    [-1 / 6, -1 / 6, -1 / 6],
    [-1 / 6, 1 / 6, -1 / 6],
    [1 / 24, 1 / 12, 1 / 6],
    [1 / 24, -1 / 12, 1 / 6],
    [0, 0, 1],
], np.float32)
_AT = np.array([
    [1, 1, 1, 1, 1, 0],
    [0, 1, -1, 2, -2, 0],
    [0, 1, 1, 4, 4, 0],
    [0, 1, -1, 8, -8, 1],
], np.float32)

_TILE = 4          # output tile
_ALPHA = 6         # input tile (TILE + 3 - 1)


def transform_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """[3,3,Cin,Cout] -> U [36, Cin, Cout] = G g G^T per channel pair."""
    g = kernel.astype(jnp.float32)
    u = jnp.einsum("ui,ijco->ujco", jnp.asarray(_G), g)
    u = jnp.einsum("vj,ujco->uvco", jnp.asarray(_G), u)
    return u.reshape(_ALPHA * _ALPHA, *kernel.shape[2:])


def _input_transform(xp: jnp.ndarray, ty: int, tx: int) -> jnp.ndarray:
    """Padded input [B, 4*ty+2, 4*tx+2, C] -> V [36, B, ty, tx, C] (f32).

    Both 1-D transforms are written as explicit +/- chains so XLA keeps
    them on the VPU instead of emitting K=6 matmuls.
    """
    x = xp.astype(jnp.float32)

    def bt_combine(rows):
        d0, d1, d2, d3, d4, d5 = rows
        return [
            4.0 * d0 - 5.0 * d2 + d4,
            -4.0 * d1 - 4.0 * d2 + d3 + d4,
            4.0 * d1 - 4.0 * d2 - d3 + d4,
            -2.0 * d1 - d2 + 2.0 * d3 + d4,
            2.0 * d1 - d2 - 2.0 * d3 + d4,
            4.0 * d1 - 5.0 * d3 + d5,
        ]

    # y axis: 6 strided row-slices per tile-row, then the B^T chain
    rows = [x[:, u:u + 4 * ty:4, :, :] for u in range(_ALPHA)]
    vy = bt_combine(rows)                      # 6 x [B, ty, 4*tx+2, C]
    # x axis: per y-transform row, 6 strided col-slices + chain
    out = []
    for vyu in vy:
        cols = [vyu[:, :, v:v + 4 * tx:4, :] for v in range(_ALPHA)]
        out.extend(bt_combine(cols))           # 36 x [B, ty, tx, C]
    return jnp.stack(out, axis=0)


def _output_transform(m: jnp.ndarray, b: int, ty: int, tx: int,
                      cout: int) -> jnp.ndarray:
    """M [36, B, ty, tx, Cout] (f32) -> Y [B, 4*ty, 4*tx, Cout] (f32)."""

    def at_combine(vals):
        m0, m1, m2, m3, m4, m5 = vals
        return [
            m0 + m1 + m2 + m3 + m4,
            m1 - m2 + 2.0 * m3 - 2.0 * m4,
            m1 + m2 + 4.0 * m3 + 4.0 * m4,
            m1 - m2 + 8.0 * m3 - 8.0 * m4 + m5,
        ]

    m6 = m.reshape(_ALPHA, _ALPHA, b, ty, tx, cout)
    yu = at_combine([m6[u] for u in range(_ALPHA)])     # 4 x [6,B,ty,tx,C]
    rows = []
    for yi in yu:
        cols = at_combine([yi[v] for v in range(_ALPHA)])  # 4 x [B,ty,tx,C]
        rows.append(jnp.stack(cols, axis=3))               # [B,ty,tx,4,C]
    y = jnp.stack(rows, axis=2)                            # [B,ty,4,tx,4,C]
    return y.reshape(b, 4 * ty, 4 * tx, cout)


def winograd_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray,
                     bias: jnp.ndarray | None = None,
                     compute_dtype=jnp.bfloat16,
                     u: jnp.ndarray | None = None) -> jnp.ndarray:
    """SAME-padded stride-1 3x3 conv via Winograd F(4,3).

    x [B,H,W,Cin] with H,W % 4 == 0; kernel [3,3,Cin,Cout]. Returns
    [B,H,W,Cout] in compute_dtype. ``u`` optionally supplies the
    pre-transformed kernel (transform_kernel) to hoist it out of jit.
    """
    b, h, w, cin = x.shape
    ph, pw = (-h) % _TILE, (-w) % _TILE
    if ph or pw:
        # zero-extend to tile multiples and crop after: SAME-padded conv
        # outputs in the kept region are unaffected by extra zero rows
        y = winograd_conv3x3(
            jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0))), kernel, bias,
            compute_dtype, u)
        return y[:, :h, :w, :]
    cout = kernel.shape[-1]
    ty, tx = h // _TILE, w // _TILE
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    v = _input_transform(xp, ty, tx)                    # [36,B,ty,tx,Cin] f32
    if u is None:
        u = transform_kernel(kernel)                    # [36,Cin,Cout] f32
    vm = v.reshape(_ALPHA * _ALPHA, b * ty * tx, cin).astype(compute_dtype)
    m = jax.lax.dot_general(
        vm, u.astype(compute_dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)             # [36, N, Cout]
    m = m.reshape(_ALPHA * _ALPHA, b, ty, tx, cout)
    y = _output_transform(m, b, ty, tx, cout)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(compute_dtype)


def winograd_conv3x3_d2(x: jnp.ndarray, kernel: jnp.ndarray,
                        bias: jnp.ndarray | None = None,
                        compute_dtype=jnp.bfloat16,
                        u: jnp.ndarray | None = None) -> jnp.ndarray:
    """Dilation-2 SAME 3x3 conv (the OICR conv5 block) via 4-phase
    decomposition into dense 3x3 convs on the (y%2, x%2) parity subgrids."""
    b, h, w, cin = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    cout = kernel.shape[-1]
    if u is None:
        u = transform_kernel(kernel)
    # [B,H,W,C] -> [B, H/2, 2, W/2, 2, C] -> phases on axis (2,4)
    xr = x.reshape(b, h // 2, 2, w // 2, 2, cin)
    phases = [xr[:, :, py, :, px, :] for py in range(2) for px in range(2)]
    outs = [winograd_conv3x3(p, kernel, None, compute_dtype, u=u)
            for p in phases]
    yr = jnp.stack(
        [jnp.stack(outs[py * 2:py * 2 + 2], axis=3) for py in range(2)],
        axis=2)                                  # [B, H/2, 2, W/2, 2, Cout]
    y = yr.reshape(b, h, w, cout)
    if bias is not None:
        y = (y.astype(jnp.float32) + bias.astype(jnp.float32))
    return y.astype(compute_dtype)

