"""Deformable convolution v1/v2 (gather formulation).

Reference: wetectron/csrc/cuda/deform_conv_kernel_cuda.cu:92-250
(deformable_im2col + bilinear sampling) and the modulated (v2) variant.
Used by ``STAGE_WITH_DCN`` ResNets — off in every shipped config, so this
is the correctness-tier XLA implementation SURVEY section 2.2 calls for:
per-tap bilinear gathers assembled into an im2col tensor and contracted on
the MXU; autodiff provides the three backward kernels for free.

Layouts are TPU-native NHWC/HWIO. The offset/mask channel orders match the
CUDA kernel exactly: offsets [B, Ho, Wo, dg*2*K] ordered (group, tap,
(dy, dx)); masks [B, Ho, Wo, dg*K] ordered (group, tap).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _bilinear(x: jnp.ndarray, h: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Per-position bilinear sample of x [H, W, C] at (h, w) [..].

    CUDA boundary semantics (deform_conv_kernel_cuda.cu:92-118): positions
    with h <= -1, >= H (resp. w) contribute 0; each of the four corners is
    zeroed independently when it falls outside the map."""
    hgt, wid, _ = x.shape
    h0 = jnp.floor(h)
    w0 = jnp.floor(w)
    lh, lw = h - h0, w - w0
    hh, hw = 1.0 - lh, 1.0 - lw
    h0i = h0.astype(jnp.int32)
    w0i = w0.astype(jnp.int32)

    def corner(dy, dx, wt):
        yy, xx = h0i + dy, w0i + dx
        ok = (yy >= 0) & (yy <= hgt - 1) & (xx >= 0) & (xx <= wid - 1)
        v = x[jnp.clip(yy, 0, hgt - 1), jnp.clip(xx, 0, wid - 1)]
        return jnp.where(ok[..., None], v, 0.0) * wt[..., None]

    val = (corner(0, 0, hh * hw) + corner(0, 1, hh * lw)
           + corner(1, 0, lh * hw) + corner(1, 1, lh * lw))
    inside = (h > -1) & (h < hgt) & (w > -1) & (w < wid)
    return jnp.where(inside[..., None], val, 0.0)


@functools.partial(jax.jit, static_argnames=("stride", "padding", "dilation",
                                             "groups", "deformable_groups"))
def deform_conv2d(x: jnp.ndarray, offset: jnp.ndarray, weight: jnp.ndarray,
                  bias: Optional[jnp.ndarray] = None,
                  mask: Optional[jnp.ndarray] = None,
                  stride: Tuple[int, int] | int = 1,
                  padding: Tuple[int, int] | int = 0,
                  dilation: Tuple[int, int] | int = 1,
                  groups: int = 1,
                  deformable_groups: int = 1) -> jnp.ndarray:
    """x [B,H,W,Cin], offset [B,Ho,Wo,dg*2*K], weight [kh,kw,Cin//g,Cout],
    mask [B,Ho,Wo,dg*K] (v2 modulation; None = v1) -> [B,Ho,Wo,Cout]."""
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    b, hgt, wid, cin = x.shape
    kh, kw, cin_g, cout = weight.shape
    k = kh * kw
    ho = (hgt + 2 * ph - (dh * (kh - 1) + 1)) // sh + 1
    wo = (wid + 2 * pw - (dw * (kw - 1) + 1)) // sw + 1
    dg = deformable_groups
    cpg = cin // dg  # channels per deformable group

    base_h = jnp.arange(ho) * sh - ph            # [Ho]
    base_w = jnp.arange(wo) * sw - pw            # [Wo]
    off = offset.reshape(b, ho, wo, dg, k, 2)
    if mask is not None:
        mod = mask.reshape(b, ho, wo, dg, k)

    def per_image(xi, offi, modi):
        cols = []
        for i in range(kh):
            for j in range(kw):
                t = i * kw + j
                h_im = (base_h[:, None, None] + i * dh) + offi[:, :, :, t, 0]
                w_im = (base_w[None, :, None] + j * dw) + offi[:, :, :, t, 1]
                taps = []
                for g in range(dg):
                    v = _bilinear(xi[..., g * cpg:(g + 1) * cpg],
                                  h_im[:, :, g], w_im[:, :, g])
                    if modi is not None:
                        v = v * modi[:, :, g, t][..., None]
                    taps.append(v)
                cols.append(jnp.concatenate(taps, axis=-1))  # [Ho,Wo,Cin]
        return jnp.stack(cols, axis=2)  # [Ho, Wo, K, Cin]

    if mask is not None:
        cols = jax.vmap(per_image)(x, off, mod)
    else:
        cols = jax.vmap(lambda xi, offi: per_image(xi, offi, None))(x, off)

    wmat = weight.reshape(k, cin_g, cout)
    if groups == 1:
        out = jnp.einsum("bhwkc,kco->bhwo", cols, wmat)
    else:
        cg = cin // groups
        og = cout // groups
        outs = []
        for g in range(groups):
            outs.append(jnp.einsum(
                "bhwkc,kco->bhwo",
                cols[..., g * cg:(g + 1) * cg],
                wmat[:, :, g * og:(g + 1) * og]))
        out = jnp.concatenate(outs, axis=-1)
    if bias is not None:
        out = out + bias
    return out


def modulated_deform_conv2d(x, offset, mask, weight, bias=None, stride=1,
                            padding=0, dilation=1, groups=1,
                            deformable_groups=1):
    """DCNv2 (modulated_deform_conv_cuda.cu): v1 + per-tap sigmoid masks
    (the sigmoid is applied by the module, not here, matching the CUDA op
    which receives post-sigmoid masks)."""
    return deform_conv2d(x, offset, weight, bias=bias, mask=mask,
                         stride=stride, padding=padding, dilation=dilation,
                         groups=groups, deformable_groups=deformable_groups)


@functools.partial(jax.jit, static_argnames=(
    "out_size", "out_channels", "no_trans", "group_size", "part_size",
    "sample_per_part", "spatial_scale", "trans_std"))
def deform_psroi_pooling(feat: jnp.ndarray, rois: jnp.ndarray,
                         trans: Optional[jnp.ndarray], out_size: int,
                         out_channels: int, no_trans: bool,
                         spatial_scale: float, group_size: int = 1,
                         part_size: Optional[int] = None,
                         sample_per_part: int = 4,
                         trans_std: float = 0.0) -> jnp.ndarray:
    """Deformable position-sensitive RoI pooling
    (csrc/cuda/deform_pool_kernel_cuda.cu DeformablePSROIPool semantics).

    feat [H, W, C] with C = out_channels * group_size^2 position-sensitive
    maps; rois [N, 4] xyxy image coords; trans [N, 2, part, part] learned
    (dy, dx) part offsets (ignored when no_trans). Returns
    [N, out_size, out_size, out_channels]."""
    hgt, wid, _ = feat.shape
    part = part_size or out_size
    n = rois.shape[0]

    def one(roi, tr):
        x1 = roi[0] * spatial_scale - 0.5
        y1 = roi[1] * spatial_scale - 0.5
        x2 = (roi[2] + 1.0) * spatial_scale - 0.5
        y2 = (roi[3] + 1.0) * spatial_scale - 0.5
        rw = jnp.maximum(x2 - x1, 0.1)
        rh = jnp.maximum(y2 - y1, 0.1)
        bin_h, bin_w = rh / out_size, rw / out_size
        sub_h = bin_h / sample_per_part
        sub_w = bin_w / sample_per_part

        py = jnp.arange(out_size)
        px = jnp.arange(out_size)
        part_h = jnp.floor(py.astype(jnp.float32) / out_size * part
                           ).astype(jnp.int32)
        part_w = jnp.floor(px.astype(jnp.float32) / out_size * part
                           ).astype(jnp.int32)
        if no_trans or tr is None:
            dy = jnp.zeros((out_size, out_size))
            dx = jnp.zeros((out_size, out_size))
        else:
            dy = tr[0][part_h[:, None], part_w[None, :]] * trans_std * rh
            dx = tr[1][part_h[:, None], part_w[None, :]] * trans_std * rw

        start_y = py[:, None, None, None] * bin_h + y1 + dy[:, :, None, None]
        start_x = px[None, :, None, None] * bin_w + x1 + dx[:, :, None, None]
        iy = jnp.arange(sample_per_part)
        sy = start_y + (iy[None, None, :, None] + 0.5) * sub_h
        sx = start_x + (iy[None, None, None, :] + 0.5) * sub_w
        # position-sensitive channel per output bin; group_size grid
        gy = jnp.clip((py * group_size) // out_size, 0, group_size - 1)
        gx = jnp.clip((px * group_size) // out_size, 0, group_size - 1)

        sy_f = jnp.clip(sy, 0.0, hgt - 1.0)
        sx_f = jnp.clip(sx, 0.0, wid - 1.0)
        vals = _bilinear(feat, sy_f, sx_f)  # [os, os, s, s, C]
        valid = (sy > -0.5) & (sy < hgt - 0.5) & (sx > -0.5) & (sx < wid - 0.5)
        vals = jnp.where(valid[..., None], vals, 0.0)
        cnt = jnp.maximum(valid.sum(axis=(2, 3)), 1)        # [os, os]
        summed = vals.sum(axis=(2, 3))                      # [os, os, C]
        c = summed.reshape(out_size, out_size, group_size, group_size,
                           out_channels)
        sel = c[jnp.arange(out_size)[:, None], jnp.arange(out_size)[None, :],
                gy[:, None], gx[None, :]]                   # [os, os, oc]
        return sel / cnt[..., None]

    if no_trans or trans is None:
        return jax.vmap(lambda r: one(r, None))(rois)
    return jax.vmap(one)(rois, trans)
