"""Pallas TPU kernel for RoI max pooling.

Replaces the reference's ROIPool CUDA kernel (csrc/cuda/ROIPool_cuda.cu) on
the hot path. The pure-XLA fallback (ops/roi_pool.py) gathers a window per
roi through HBM (~17 GB/batch, ~43 ms/image measured); this kernel keeps
channel-tiled feature blocks resident in VMEM and reads each roi's window
with on-chip dynamic slices, so HBM traffic is one pass over the feature
map + the pooled output (~350 MB/batch).

Design:
- A max-pool pyramid (levels 0..L-1, factor 2^l) is built in jnp (cheap,
  differentiable). Each roi reads a static WIN x WIN_W window from the level
  where its extent fits: level = ceil(log2(ext / WIN)). Level 0 (rois up to
  WIN cells = 128 px at stride 8) reproduces the CUDA semantics exactly —
  round-half-up cell coords, integer-exact floor/ceil bin edges, empty bins
  = 0; higher levels pool over 2^l-cell superblocks (documented
  approximation for large rois only).
- Grid (B, C_tiles, roi_chunks), rightmost fastest: pyramid blocks
  [1, Hl, Wl, CT] have grid-constant indices along the roi axis, so Mosaic
  keeps them in VMEM across all roi chunks. Each program pools CHUNK rois
  with a separable masked max (rows -> 7 bins, then cols -> 7 bins), built
  from rank-3 iota masks and keepdims reductions (Mosaic rejects
  rank-increasing reshapes of mask vectors).
- W-axis dynamic-slice starts must be sublane (8) aligned: starts are
  aligned down and the window widened to WIN_W = WIN + 8.
- Backward: custom_vjp; the backward kernel recomputes each roi's window,
  routes bin cotangents to cells equal to the bin max (the CUDA argmax
  backward, modulo exact-tie double counting), and accumulates into
  per-level d_feat blocks that stay resident across roi chunks. Pyramid
  construction's own VJP is handled by XLA autodiff outside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 16          # window rows; per-level roi extent cap (level-0-exact)
WIN_W = 24        # window cols: WIN + 8 sublane-alignment slack
CHUNK = 32        # rois per program (fewer, fatter programs: grid overhead dominated at 8)
DEFAULT_LEVELS = 5
_NEG_THRESH = -1e37  # "never written" sentinel detector (bf16/f32 safe)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pyramid(feat: jnp.ndarray, n_levels: int):
    """Max-pool pyramid; every level padded so Hl >= WIN, Wl >= WIN_W.
    Padding uses the dtype min so it never wins a max."""
    pads = []
    levels = []
    x = feat
    neg = jnp.asarray(jnp.finfo(feat.dtype).min, feat.dtype)
    for l in range(n_levels):
        h, w = x.shape[1], x.shape[2]
        hp = max(_round_up(h, 8), WIN)
        wp = max(_round_up(w, 8), WIN_W)
        xp = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)),
                     constant_values=neg)
        levels.append(xp)
        pads.append((h, w))
        if l + 1 < n_levels:
            x2 = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)),
                         constant_values=neg)
            # init must be -inf: only the canonical max-pool reduce_window
            # has a registered VJP (generic reduce_window doesn't)
            x = jax.lax.reduce_window(
                x2, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return levels, pads


def _roi_meta(rois: jnp.ndarray, mask: jnp.ndarray, spatial_scale: float,
              n_levels: int) -> jnp.ndarray:
    """Per-roi int32 metadata [B, P, 8]: x1, y1, x2, y2 (level-0 cells,
    CUDA round-half-up), level, valid, 0, 0 (padded to 8)."""
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


def _pick_roi(meta, r, feat_refs, level_dims):
    """Per-roi scalars + the window selected from the roi's pyramid level.

    Returns (window [WIN, WIN_W, CT] f32, y1l, x1l, rhl, rwl, ys, xs,
    hl_real, wl_real, valid) — all scalars traced, selected with binary
    wheres (Mosaic select_n only supports 2 cases)."""
    x1 = meta[0, r, 0]
    y1 = meta[0, r, 1]
    x2 = meta[0, r, 2]
    y2 = meta[0, r, 3]
    lvl = meta[0, r, 4]
    valid = meta[0, r, 5] > 0

    window = None
    scalars = None
    for l, (ref, (hl, wl)) in enumerate(zip(feat_refs, level_dims)):
        y1l, x1l, y2l, x2l = y1 >> l, x1 >> l, y2 >> l, x2 >> l
        rhl = jnp.maximum(y2l - y1l + 1, 1)
        rwl = jnp.maximum(x2l - x1l + 1, 1)
        hp, wp = ref.shape[1], ref.shape[2]
        ys = jnp.clip(y1l, 0, hp - WIN)
        xs = jnp.clip((jnp.clip(x1l, 0, wp - 1) // 8) * 8, 0, wp - WIN_W)
        win = ref[0, pl.ds(ys, WIN), pl.ds(pl.multiple_of(xs, 8), WIN_W), :]
        win = win.astype(jnp.float32)
        sc = (y1l, x1l, rhl, rwl, ys, xs,
              jnp.asarray(hl, jnp.int32), jnp.asarray(wl, jnp.int32))
        if window is None:
            window, scalars = win, sc
        else:
            is_l = lvl == l
            window = jnp.where(is_l, win, window)
            scalars = tuple(jnp.where(is_l, a, b) for a, b in zip(sc, scalars))
    return (window,) + scalars + (valid,)


def _bin_edges_scalar(k: int, start, length, limit):
    """Integer-exact CUDA bin edges for bin k (static) along one axis."""
    lo = jnp.clip((k * length) // 7 + start, 0, limit)
    hi = jnp.clip(((k + 1) * length + 6) // 7 + start, 0, limit)
    return lo, hi


def _row_stage(window, y1l, rhl, ys, hl):
    """rows -> 7 row-bins: list of 7 [1, WIN_W, CT] masked maxima."""
    rows3 = jax.lax.broadcasted_iota(jnp.int32, (WIN, 1, 1), 0) + ys
    out = []
    for ph in range(7):
        lo, hi = _bin_edges_scalar(ph, y1l, rhl, hl)
        m = (rows3 >= lo) & (rows3 < hi)
        out.append(jnp.max(jnp.where(m, window, _NEG_THRESH * 10.0),
                           axis=0, keepdims=True))
    return out  # 7 x [1, WIN_W, CT]


def _col_masks(x1l, rwl, xs, wl):
    cols3 = jax.lax.broadcasted_iota(jnp.int32, (1, WIN_W, 1), 1) + xs
    masks = []
    for pw in range(7):
        lo, hi = _bin_edges_scalar(pw, x1l, rwl, wl)
        masks.append((cols3 >= lo) & (cols3 < hi))
    return masks  # 7 x [1, WIN_W, 1]


def _fwd_kernel(meta_ref, *refs, n_levels, level_dims):
    feat_refs = refs[:n_levels]
    out_ref = refs[n_levels]
    for r in range(CHUNK):
        (window, y1l, x1l, rhl, rwl, ys, xs, hl, wl, valid) = _pick_roi(
            meta_ref, r, feat_refs, level_dims)
        tmp = jnp.concatenate(_row_stage(window, y1l, rhl, ys, hl), axis=0)
        cmasks = _col_masks(x1l, rwl, xs, wl)
        res_cols = []
        for pw in range(7):
            masked = jnp.where(cmasks[pw], tmp, _NEG_THRESH * 10.0)
            res_cols.append(jnp.max(masked, axis=1, keepdims=True))  # [7,1,CT]
        res = jnp.concatenate(res_cols, axis=1)  # [7, 7, CT]
        # empty bins / padded rois -> exactly 0 (ROIPool_cuda.cu:57-60)
        ok = (res > _NEG_THRESH) & valid
        res = jnp.where(ok, res, 0.0)
        out_ref[0, r] = res.astype(out_ref.dtype)


def _bwd_kernel(meta_ref, *refs, n_levels, level_dims):
    feat_refs = refs[:n_levels]
    g_ref = refs[n_levels]
    dfeat_refs = refs[n_levels + 1:]
    rc = pl.program_id(2)

    @pl.when(rc == 0)
    def _():
        for dref in dfeat_refs:
            dref[...] = jnp.zeros(dref.shape, dref.dtype)

    for r in range(CHUNK):
        x1 = meta_ref[0, r, 0]
        y1 = meta_ref[0, r, 1]
        x2 = meta_ref[0, r, 2]
        y2 = meta_ref[0, r, 3]
        lvl = meta_ref[0, r, 4]
        valid = meta_ref[0, r, 5] > 0
        for l, (ref, dref, (hl, wl)) in enumerate(
                zip(feat_refs, dfeat_refs, level_dims)):
            y1l, x1l, y2l, x2l = y1 >> l, x1 >> l, y2 >> l, x2 >> l
            rhl = jnp.maximum(y2l - y1l + 1, 1)
            rwl = jnp.maximum(x2l - x1l + 1, 1)
            hp, wp = ref.shape[1], ref.shape[2]
            ys = jnp.clip(y1l, 0, hp - WIN)
            xs = jnp.clip((jnp.clip(x1l, 0, wp - 1) // 8) * 8, 0, wp - WIN_W)
            xs = pl.multiple_of(xs, 8)
            window = ref[0, pl.ds(ys, WIN), pl.ds(xs, WIN_W), :].astype(
                jnp.float32)
            active = (lvl == l) & valid

            tmp = jnp.concatenate(_row_stage(window, y1l, rhl, ys, hl), axis=0)
            cmasks = _col_masks(x1l, rwl, xs, wl)
            d_tmp = jnp.zeros(tmp.shape, jnp.float32)
            for pw in range(7):
                masked = jnp.where(cmasks[pw], tmp, _NEG_THRESH * 10.0)
                res_pw = jnp.max(masked, axis=1, keepdims=True)  # [7,1,CT]
                g_pw = g_ref[0, r, :, pw:pw + 1, :].astype(jnp.float32)
                g_pw = jnp.where((res_pw > _NEG_THRESH) & active, g_pw, 0.0)
                d_tmp = d_tmp + jnp.where(masked == res_pw, g_pw, 0.0)

            rows3 = jax.lax.broadcasted_iota(jnp.int32, (WIN, 1, 1), 0) + ys
            d_window = jnp.zeros(window.shape, jnp.float32)
            for ph in range(7):
                lo, hi = _bin_edges_scalar(ph, y1l, rhl, hl)
                m = (rows3 >= lo) & (rows3 < hi)
                masked_w = jnp.where(m, window, _NEG_THRESH * 10.0)
                tmp_ph = jnp.max(masked_w, axis=0, keepdims=True)
                d_t_ph = d_tmp[ph:ph + 1]
                d_window = d_window + jnp.where(masked_w == tmp_ph, d_t_ph, 0.0)

            cur = dref[0, pl.ds(ys, WIN), pl.ds(xs, WIN_W), :]
            dref[0, pl.ds(ys, WIN), pl.ds(xs, WIN_W), :] = (
                cur + d_window.astype(dref.dtype))


def _choose_ct(h: int, w: int, c: int, n_levels: int,
               bytes_per_el: int = 2) -> int:
    """Channel tile: Mosaic requires the lane (last) block dim to be a
    multiple of 128 or the full dim, so the tile is 128 whenever possible;
    `pallas_pool_feasible` gates shapes whose resident blocks would not fit
    VMEM at that tile."""
    del h, w, n_levels, bytes_per_el
    return 128 if c % 128 == 0 else c


def pallas_pool_feasible(h: int, w: int, c: int,
                         n_levels: int = DEFAULT_LEVELS) -> bool:
    """True if the resident pyramid blocks fit VMEM at ct=128 (the minimum
    lane-aligned channel tile), double-buffering included. Callers fall back
    to the XLA path above this size (largest TTA scales)."""
    if c % 128 != 0:
        return False
    total = 0
    hh, ww = h, w
    for _ in range(n_levels):
        total += (max(_round_up(hh, 8), WIN)
                  * max(_round_up(ww, 8), WIN_W) * 128 * 2)  # bf16 bytes
        hh, ww = -(-hh // 2), -(-ww // 2)
    return total * 2 <= 14 * 1024 * 1024  # x2 double-buffering


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
                               level_dims=tuple(pads))
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
    g_p = jnp.pad(g.astype(jnp.float32),
                  ((0, 0), (0, pad_p), (0, 0), (0, 0), (0, 0)))

    def pyr_fn(f):
        levels, _ = _pyramid(f, n_levels)
        return tuple(levels)

    levels, pyr_vjp = jax.vjp(pyr_fn, feat)
    _, pads = _pyramid(feat, n_levels)
    ct = _choose_ct(h, w, c, n_levels, bytes_per_el=6)

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
    )(meta, *levels, g_p)
    (d_feat,) = pyr_vjp(tuple(dl.astype(lv.dtype)
                              for dl, lv in zip(d_levels, levels)))
    return d_feat, None, None


roi_pool_tpu.defvjp(_roi_pool_tpu_fwd, _roi_pool_tpu_bwd)
