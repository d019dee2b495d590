"""Space-to-depth VGG stem: pool1(relu(conv1_2(relu(conv1_1(x))))) exactly.

The first VGG block is the eval forward's single worst segment on TPU
(in-graph at the bench shape, tools/profile_backbone_prefix.py round 4):
conv1_1 8.9 ms at 3.7 TF/s (XLA pads C_in=3 to the 128-lane register, so
~97% of the MXU work is zeros), conv1_2 10.2 ms at 64 TF/s (C=64 fills half
the lanes), pool1 2.8 ms — 21.9 ms of the 56.7 ms backbone, while conv3-5
run at ~195 TF/s, essentially the v5e's speed of light. This module is the
classic TPU space-to-depth stem transform (as used by MLPerf ResNet
submissions), specialized to VGG's stride-1 stem + 2x2 maxpool:

- ``conv1_1`` is computed for all 4 output phases at once as ONE 4x4
  stride-2 conv: output rows 2i+p (phase p in {0,1}) of the stride-1 conv
  read input rows 2i-1 .. 2i+2 across both phases — a 4x4 window at
  stride 2 — so a [4,4,Cin,4*C1] kernel (`_stem_w1`, a zero-scattered
  rearrangement of the ordinary [3,3,3,64] kernel; parameters,
  checkpoints and importers untouched) emits [B,H/2,W/2,4*C1] with
  output phase (p,q) in channel group p*2+q. No input reshuffle at all.
  (Measured round 4, tools/profile_s2d_variants.py: 7.5 ms vs the direct
  conv1_1's 8.9; an explicit-s2d im2col GEMM form measured 33.8 ms — the
  9-view stack is HBM-bound — and an s2d-native [3,3,12,256] conv costs
  6.1 ms but needs a 6.1 ms transpose first.)
- ``conv1_2 + pool1`` fold into ONE half-resolution 2x2 conv: writing
  output rows as r = 2i+p (phase p in {0,1}), each output phase of the
  stride-1 conv is a 2x2-window conv over the s2d tensor with a
  phase-specific [2,2,4*64,64] kernel; batching the 4 phases into one
  [2,2,256,256] conv (`_stem_w2`) keeps the MXU's K at 1024. The 2x2
  maxpool is then exactly the elementwise max over the 4 phase outputs —
  the 1.4 GB full-res conv1_2 activation never exists, and pool1 costs a
  fused 4-way max instead of a windowed reduction.

This is pure re-association of the same bf16 multiply/f32-accumulate sums
(NOT an approximation like int8 or Winograd): drift vs the direct path is
accumulation-order-only, bounded in tests/test_s2d_stem.py and zero in f32.

Reference semantics: wetectron/modeling/backbone/vgg16.py:66-84 builds the
stem as Conv2d(3,64,3,pad=1) -> ReLU -> Conv2d(64,64,3,pad=1) -> ReLU ->
MaxPool2d(2,2); relu commutes with max, so relu+bias apply once after the
phase max.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _stem_w1(k1: jnp.ndarray) -> jnp.ndarray:
    """[3,3,Cin,C1] conv kernel -> [4,4,Cin,4*C1] phase-batched kernel.

    Output phase (p,q) at half-res position (i,j) is the stride-1 conv
    output at (2i+p, 2j+q) = sum over taps of x[2i+p+dy-1, 2j+q+dx-1] *
    k1[dy,dx]; with the input padded by (1 top/left, 2 bottom/right), the
    stride-2 4x4 window for (i,j) reads x[2i-1+t, 2j-1+s], so tap (t,s)
    carries k1[t-p, s-q] into output channel group p*2+q (zero when t-p
    or s-q falls outside the 3x3 kernel).
    """
    kh, kw, cin, c1 = k1.shape
    assert (kh, kw) == (3, 3)
    w = jnp.zeros((4, 4, cin, 4 * c1), k1.dtype)
    for t in range(4):
        for s in range(4):
            for p in range(2):
                for q in range(2):
                    dy, dx = t - p, s - q
                    if 0 <= dy < 3 and 0 <= dx < 3:
                        c0 = (p * 2 + q) * c1
                        w = w.at[t, s, :, c0:c0 + c1].set(k1[dy, dx])
    return w


def _stem_w2(k2: jnp.ndarray) -> jnp.ndarray:
    """[3,3,C1,C2] conv kernel -> [2,2,4*C1,4*C2] phase-conv kernel.

    Window tap (ur,vr) over the zero-padded s2d tensor reads original row
    2(i+p) + 2ur + py - 2 at output phase p (the phase-(p,q) output is
    sliced from conv rows t = i+p), so dy = p + 2ur + py - 1; 9 of the 16
    (tap, input-phase) pairs are live per output phase.
    """
    kh, kw, c1, c2 = k2.shape
    assert (kh, kw) == (3, 3)
    w = jnp.zeros((2, 2, 4 * c1, 4 * c2), k2.dtype)
    for ur in range(2):
        for vr in range(2):
            for py in range(2):
                for px in range(2):
                    for p in range(2):
                        for q in range(2):
                            dy = p + 2 * ur + py - 1
                            dx = q + 2 * vr + px - 1
                            if 0 <= dy < 3 and 0 <= dx < 3:
                                ci0 = (py * 2 + px) * c1
                                co0 = (p * 2 + q) * c2
                                w = w.at[ur, vr, ci0:ci0 + c1,
                                         co0:co0 + c2].set(k2[dy, dx])
    return w


def stem_s2d(x: jnp.ndarray, k1: jnp.ndarray, b1: jnp.ndarray,
             k2: jnp.ndarray, b2: jnp.ndarray,
             compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """pool1(relu(conv1_2(relu(conv1_1(x))))) at half resolution throughout.

    x: [B,H,W,Cin] with H, W even; k1 [3,3,Cin,C1], k2 [3,3,C1,C2] are the
    ordinary SAME-pad stride-1 conv kernels. Returns [B,H/2,W/2,C2].
    """
    b, h, w, cin = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    c1, c2 = k1.shape[-1], k2.shape[-1]
    h2, w2 = h // 2, w // 2
    x = x.astype(compute_dtype)

    # conv1_1 for all 4 output phases as one 4x4 stride-2 conv; rows -1 and
    # H are the stride-1 conv's genuine SAME padding, row H+1 (the extra
    # bottom/right pad) only meets zero kernel entries (t-p == 3).
    w1 = _stem_w1(k1).astype(compute_dtype)
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
    y1 = jax.lax.conv_general_dilated(
        xp, w1, (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))   # [B, h2, w2, 4*C1]
    y1 = jnp.maximum(y1 + jnp.tile(b1, 4).astype(compute_dtype), 0)

    # conv1_2 for all 4 output phases as one 2x2 conv over padded s2d input
    w2k = _stem_w2(k2).astype(compute_dtype)
    y1p = jnp.pad(y1, ((0, 0), (1, 1), (1, 1), (0, 0)))
    z = jax.lax.conv_general_dilated(
        y1p, w2k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))   # [B, h2+1, w2+1, 4*C2]

    # pool1 = max over the 4 phases (phase (p,q) lives at row/col offset
    # (p,q) in its own channel group); bias + relu commute with the max
    out = None
    for p in range(2):
        for q in range(2):
            g = z[:, p:p + h2, q:q + w2, (p * 2 + q) * c2:(p * 2 + q + 1) * c2]
            out = g if out is None else jnp.maximum(out, g)
    return jnp.maximum(out + b2.astype(compute_dtype), 0)
