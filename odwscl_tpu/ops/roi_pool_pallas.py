"""Pallas TPU kernel for RoI max pooling.

Replaces the reference's ROIPool CUDA kernel (csrc/cuda/ROIPool_cuda.cu) on
the hot path. The pure-XLA fallback (ops/roi_pool.py) gathers a window per
roi through HBM (~17 GB/batch, ~43 ms/image measured); this kernel keeps
channel-tiled feature blocks resident in VMEM and reads each roi's window
with on-chip dynamic slices, so HBM traffic is one pass over the feature
map + the pooled output (~350 MB/batch).

Design:
- A max-pool pyramid (levels 0..L-1, factor 2^l) is built in jnp (cheap,
  differentiable). Each roi reads a static WIN x WIN window from the level
  where its extent fits: level = ceil(log2(ext / WIN)). Level 0 (rois up to
  WIN cells = WIN*8 px at stride 8) reproduces the CUDA semantics exactly —
  round-half-up cell coords, floor/ceil bin edges, empty bins = 0; higher
  levels pool over 2^l-cell superblocks (documented approximation for large
  rois only).
- Grid (B, C_tiles, roi_chunks), rightmost fastest: pyramid blocks
  [1, Hl, Wl, CT] have grid-constant indices along the roi axis, so Mosaic
  keeps them in VMEM across all roi chunks. Each program pools CHUNK rois
  with a separable masked max (rows -> 7 bins, then cols -> 7 bins).
- Backward: custom_vjp; the backward kernel recomputes each roi's window,
  routes the bin cotangent to cells equal to the bin max (the CUDA argmax
  backward, modulo exact-tie double counting), and accumulates into
  per-level d_feat blocks that stay resident across roi chunks. Pyramid
  construction's own VJP is handled by XLA autodiff outside the kernel.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 16          # window size (cells) per axis; level-0-exact up to WIN
CHUNK = 8         # rois per program
DEFAULT_LEVELS = 5


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pyramid(feat: jnp.ndarray, n_levels: int):
    """Max-pool pyramid; every level padded so Hl, Wl >= WIN (and lane-
    aligned). Padding uses the dtype min so it never wins a max."""
    pads = []
    levels = []
    x = feat
    neg = jnp.asarray(jnp.finfo(feat.dtype).min, feat.dtype)
    for l in range(n_levels):
        h, w = x.shape[1], x.shape[2]
        hp = max(_round_up(h, 8), WIN)
        wp = max(_round_up(w, 8), WIN)
        xp = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)),
                     constant_values=neg)
        levels.append(xp)
        pads.append((h, w))
        if l + 1 < n_levels:
            ph = h % 2
            pw = w % 2
            x2 = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                         constant_values=neg)
            x = jax.lax.reduce_window(
                x2, neg, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return levels, pads


def _roi_meta(rois: jnp.ndarray, mask: jnp.ndarray, spatial_scale: float,
              n_levels: int) -> jnp.ndarray:
    """Per-roi int32 metadata [B, P, 8]: x1, y1, x2, y2 (level-0 cells,
    CUDA round-half-up), level, valid, 0, 0 (padded to 8 for alignment)."""
    cells = jnp.floor(rois * spatial_scale + 0.5).astype(jnp.int32)
    x1, y1, x2, y2 = (cells[..., i] for i in range(4))
    rw = jnp.maximum(x2 - x1 + 1, 1)
    rh = jnp.maximum(y2 - y1 + 1, 1)
    ext = jnp.maximum(rw, rh)
    level = jnp.zeros_like(ext)
    for l in range(1, n_levels):
        level = jnp.where(ext > WIN * (2 ** (l - 1)), l, level)
    zeros = jnp.zeros_like(x1)
    return jnp.stack([x1, y1, x2, y2, level, mask.astype(jnp.int32),
                      zeros, zeros], axis=-1)


def _bin_masks(y1l, rhl, ys, hl_real, dtype=jnp.float32):
    """row/col bin membership [7, WIN] for one axis (ROIPool_cuda.cu:43-56)."""
    ph = jax.lax.broadcasted_iota(jnp.int32, (7, 1), 0).astype(jnp.float32)
    bin_sz = rhl.astype(jnp.float32) / 7.0
    lo = jnp.clip(jnp.floor(ph * bin_sz).astype(jnp.int32) + y1l, 0, hl_real)
    hi = jnp.clip(jnp.ceil((ph + 1.0) * bin_sz).astype(jnp.int32) + y1l,
                  0, hl_real)
    rows = ys + jax.lax.broadcasted_iota(jnp.int32, (1, WIN), 1)
    member = (rows >= lo) & (rows < hi)  # [7, WIN]
    empty = (hi <= lo)[:, 0]             # [7]
    return member, empty


def _window_and_params(meta, r, feat_refs, level_dims):
    """Load the roi's window from every level and select by its level.
    Returns window [WIN, WIN, CT], row/col masks [7, WIN], empty [7,7]."""
    x1 = meta[0, r, 0]
    y1 = meta[0, r, 1]
    x2 = meta[0, r, 2]
    y2 = meta[0, r, 3]
    lvl = meta[0, r, 4]

    windows = []
    rowms, colms, emptys = [], [], []
    for l, (ref, (hl_real, wl_real)) in enumerate(zip(feat_refs, level_dims)):
        y1l, x1l, y2l, x2l = y1 >> l, x1 >> l, y2 >> l, x2 >> l
        rhl = jnp.maximum(y2l - y1l + 1, 1)
        rwl = jnp.maximum(x2l - x1l + 1, 1)
        hp, wp = ref.shape[1], ref.shape[2]
        ys = jnp.clip(y1l, 0, hp - WIN)
        xs = jnp.clip(x1l, 0, wp - WIN)
        win = ref[0, pl.ds(ys, WIN), pl.ds(xs, WIN), :]
        row_m, row_e = _bin_masks(y1l, rhl, ys, hl_real)
        col_m, col_e = _bin_masks(x1l, rwl, xs, wl_real)
        windows.append(win)
        rowms.append(row_m)
        colms.append(col_m)
        emptys.append(row_e[:, None] | col_e[None, :])

    lvl_c = jnp.clip(lvl, 0, len(feat_refs) - 1)
    window = jax.lax.select_n(lvl_c, *windows) if len(windows) > 1 else windows[0]
    row_m = jax.lax.select_n(lvl_c, *rowms) if len(rowms) > 1 else rowms[0]
    col_m = jax.lax.select_n(lvl_c, *colms) if len(colms) > 1 else colms[0]
    empty = jax.lax.select_n(lvl_c, *emptys) if len(emptys) > 1 else emptys[0]
    valid = meta[0, r, 5] > 0
    return window, row_m, col_m, empty | jnp.logical_not(valid)


def _fwd_kernel(meta_ref, *refs, n_levels, level_dims):
    feat_refs = refs[:n_levels]
    out_ref = refs[n_levels]
    neg = jnp.asarray(jnp.finfo(out_ref.dtype).min, out_ref.dtype)
    for r in range(CHUNK):
        window, row_m, col_m, empty = _window_and_params(
            meta_ref, r, feat_refs, level_dims)
        # separable masked max: rows -> [7, WIN, CT]; cols -> [7, 7, CT]
        tmp = jnp.max(jnp.where(row_m[:, :, None, None],
                                window[None, :, :, :], neg), axis=1)
        res = jnp.max(jnp.where(col_m[None, :, :, None],
                                tmp[:, None, :, :], neg), axis=2)
        res = jnp.where(empty[:, :, None], jnp.zeros_like(res), res)
        out_ref[0, r] = res


def _bwd_kernel(meta_ref, *refs, n_levels, level_dims):
    feat_refs = refs[:n_levels]
    g_ref = refs[n_levels]
    dfeat_refs = refs[n_levels + 1:]
    rc = pl.program_id(2)

    @pl.when(rc == 0)
    def _():
        for dref in dfeat_refs:
            dref[...] = jnp.zeros(dref.shape, dref.dtype)

    neg_f = jnp.asarray(jnp.finfo(feat_refs[0].dtype).min, feat_refs[0].dtype)
    for r in range(CHUNK):
        x1 = meta_ref[0, r, 0]
        y1 = meta_ref[0, r, 1]
        x2 = meta_ref[0, r, 2]
        y2 = meta_ref[0, r, 3]
        lvl = meta_ref[0, r, 4]
        valid = meta_ref[0, r, 5]
        for l, (ref, dref, (hl_real, wl_real)) in enumerate(
                zip(feat_refs, dfeat_refs, level_dims)):
            y1l, x1l, y2l, x2l = y1 >> l, x1 >> l, y2 >> l, x2 >> l
            rhl = jnp.maximum(y2l - y1l + 1, 1)
            rwl = jnp.maximum(x2l - x1l + 1, 1)
            hp, wp = ref.shape[1], ref.shape[2]
            ys = jnp.clip(y1l, 0, hp - WIN)
            xs = jnp.clip(x1l, 0, wp - WIN)
            window = ref[0, pl.ds(ys, WIN), pl.ds(xs, WIN), :]
            row_m, row_e = _bin_masks(y1l, rhl, ys, hl_real)
            col_m, col_e = _bin_masks(x1l, rwl, xs, wl_real)
            # recompute the separable forward maxima for this level
            tmp = jnp.max(jnp.where(row_m[:, :, None, None],
                                    window[None, :, :, :], neg_f), axis=1)
            res = jnp.max(jnp.where(col_m[None, :, :, None],
                                    tmp[:, None, :, :], neg_f), axis=2)
            g = g_ref[0, r].astype(jnp.float32)  # [7, 7, CT]
            empty = row_e[:, None] | col_e[None, :]
            active = (lvl == l) & (valid > 0)
            g = jnp.where((~empty[:, :, None]) & active, g, 0.0)
            # separable argmax routing (the CUDA backward, modulo exact ties):
            # cols: d_tmp[ph, j] = sum_pw [col_m & tmp==res] g[ph, pw]
            wf = window.astype(jnp.float32)
            tf = tmp.astype(jnp.float32)
            rf = res.astype(jnp.float32)
            d_tmp = jnp.zeros(tmp.shape, jnp.float32)
            for pw in range(7):
                sel = col_m[None, pw, :, None] & (tf == rf[:, pw, None, :])
                d_tmp = d_tmp + jnp.where(sel, g[:, pw, None, :], 0.0)
            # rows: d_window[i, j] = sum_ph [row_m & window==tmp] d_tmp[ph, j]
            d_window = jnp.zeros(window.shape, jnp.float32)
            for ph in range(7):
                sel = row_m[ph, :, None, None] & (wf == tf[ph, None, :, :])
                d_window = d_window + jnp.where(sel, d_tmp[ph, None, :, :], 0.0)
            cur = dref[0, pl.ds(ys, WIN), pl.ds(xs, WIN), :]
            dref[0, pl.ds(ys, WIN), pl.ds(xs, WIN), :] = (
                cur + d_window.astype(dref.dtype))


def _choose_ct(h: int, w: int, c: int, n_levels: int) -> int:
    """Channel tile so all resident level blocks fit comfortably in VMEM."""
    budget = 10 * 1024 * 1024  # bytes for pyramid blocks (fwd) / 2x (bwd)
    for ct in (128, 64, 32):
        if ct > c:
            continue
        total = 0
        hh, ww = h, w
        for _ in range(n_levels):
            total += max(_round_up(hh, 8), WIN) * max(_round_up(ww, 8), WIN) * ct * 2
            hh, ww = -(-hh // 2), -(-ww // 2)
        if total <= budget:
            return ct
    return 32


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def roi_pool_tpu(feat, rois, roi_mask, spatial_scale, pooled=7,
                 n_levels=DEFAULT_LEVELS):
    out, _ = _roi_pool_tpu_fwd(feat, rois, roi_mask, spatial_scale, pooled,
                               n_levels)
    return out


def _run_fwd(levels, pads, meta, b, p, c, ct, dtype, interpret=False):
    n_levels = len(levels)
    rc = p // CHUNK
    grid = (b, c // ct, rc)
    level_dims = tuple(pads)

    in_specs = [pl.BlockSpec((1, CHUNK, 8), lambda bi, ci, ri: (bi, ri, 0),
                             memory_space=pltpu.SMEM)]
    for lv in levels:
        hl, wl = lv.shape[1], lv.shape[2]
        in_specs.append(pl.BlockSpec(
            (1, hl, wl, ct),
            lambda bi, ci, ri: (bi, 0, 0, ci),
            memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((1, CHUNK, 7, 7, ct),
                            lambda bi, ci, ri: (bi, ri, 0, 0, ci),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_fwd_kernel, n_levels=n_levels,
                               level_dims=level_dims)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, p, 7, 7, c), dtype),
        interpret=interpret,
    )(meta, *levels)


def _roi_pool_tpu_fwd(feat, rois, roi_mask, spatial_scale, pooled, n_levels):
    assert pooled == 7, "kernel is specialized to the shipped 7x7 pooler"
    b, h, w, c = feat.shape
    p = rois.shape[1]
    pad_p = (-p) % CHUNK
    rois_p = jnp.pad(rois, ((0, 0), (0, pad_p), (0, 0)))
    mask_p = jnp.pad(roi_mask, ((0, 0), (0, pad_p)))
    meta = _roi_meta(rois_p, mask_p, spatial_scale, n_levels)

    levels, pads = _pyramid(feat, n_levels)
    ct = _choose_ct(h, w, c, n_levels)
    out = _run_fwd(levels, pads, meta, b, p + pad_p, c, ct, feat.dtype)
    out = out[:, :p]
    return out, (feat, rois, roi_mask)


def _roi_pool_tpu_bwd(spatial_scale, pooled, n_levels, residuals, g):
    feat, rois, roi_mask = residuals
    b, h, w, c = feat.shape
    p = rois.shape[1]
    pad_p = (-p) % CHUNK
    rois_p = jnp.pad(rois, ((0, 0), (0, pad_p), (0, 0)))
    mask_p = jnp.pad(roi_mask, ((0, 0), (0, pad_p)))
    meta = _roi_meta(rois_p, mask_p, spatial_scale, n_levels)
    g_p = jnp.pad(g.astype(feat.dtype), ((0, 0), (0, pad_p), (0, 0), (0, 0),
                                         (0, 0)))

    def pyr_fn(f):
        levels, _ = _pyramid(f, n_levels)
        return tuple(levels)

    levels, pyr_vjp = jax.vjp(pyr_fn, feat)
    _, pads = _pyramid(feat, n_levels)
    ct = _choose_ct(h, w, c, n_levels)

    rc = (p + pad_p) // CHUNK
    grid = (b, c // ct, rc)
    in_specs = [pl.BlockSpec((1, CHUNK, 8), lambda bi, ci, ri: (bi, ri, 0),
                             memory_space=pltpu.SMEM)]
    for lv in levels:
        hl, wl = lv.shape[1], lv.shape[2]
        in_specs.append(pl.BlockSpec((1, hl, wl, ct),
                                     lambda bi, ci, ri: (bi, 0, 0, ci),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((1, CHUNK, 7, 7, ct),
                                 lambda bi, ci, ri: (bi, ri, 0, 0, ci),
                                 memory_space=pltpu.VMEM))
    out_specs = []
    out_shapes = []
    for lv in levels:
        hl, wl = lv.shape[1], lv.shape[2]
        out_specs.append(pl.BlockSpec((1, hl, wl, ct),
                                      lambda bi, ci, ri: (bi, 0, 0, ci),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct(lv.shape, jnp.float32))

    kernel = functools.partial(_bwd_kernel, n_levels=n_levels,
                               level_dims=tuple(pads))
    d_levels = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=False,
    )(meta, *levels, g_p)
    (d_feat,) = pyr_vjp(tuple(dl.astype(lv.dtype)
                              for dl, lv in zip(d_levels, levels)))
    return d_feat, None, None


roi_pool_tpu.defvjp(_roi_pool_tpu_fwd, _roi_pool_tpu_bwd)
