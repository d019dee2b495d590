"""Pallas TPU kernel for RoI max pooling — exact for every roi size.

Replaces the reference's ROIPool CUDA kernel (csrc/cuda/ROIPool_cuda.cu:16-108)
on both the eval and train hot paths. Semantics reproduced bit-exactly:
round-half-up cell coords, malformed rois forced 1x1, integer floor/ceil bin
edges clipped to the map, empty bins = 0, max-routing backward.

Design (v4 — replaces the v3 exact-range row loops; the row stage is O(1)):
- A row-max SPARSE TABLE is built once per (batch, channel-tile) grid cell:
  level j holds max over rows [y, y + 2^j). Any row-bin range [lo, hi) then
  reduces with TWO loads, max(T[j][lo], T[j][hi - 2^j]) for
  j = floor(log2(hi - lo)) — v3 looped the bin's rows one dynamic-bound
  load at a time, which made the kernel scalar-loop-bound (~35 dynamic
  iterations per roi). Levels are capped by VMEM; rare ranges longer than
  the top span finish with a short stepped loop over top-level entries.
- The column stage visits each column bin's EXACT 8-wide aligned column
  group range (Mosaic requires sublane offsets % 8 == 0) with a masked
  max per group — a static all-groups unroll was measured 7x redundant
  for wide rois (each group belongs to ~1-2 bins).
- Per-roi column windows (24 / 40 / 88 / full-width classes, chosen on the
  host) bound the row-load width cw so small rois touch little VMEM.
- Backward (custom_vjp, v5): routes each bin's cotangent to the CUDA
  FIRST-ARGMAX cell — bit-parity with ROIPool_cuda.cu's stored-argmax
  scatter, including on bf16 ties (v4 split ties evenly per reduction
  stage, a documented deviation now removed). One raw
  (max, first-argmax-row) scan per row-bin replaces v4's sparse-table
  recompute + two tie-count/route sweeps; the column stage tracks a
  min row-major key through its single merge pass and routes by iota
  compare (see _bwd_kernel docstring). All routing math is f32 (exact
  for bf16 features; bf16 i1 compare vectors trip Mosaic relayout
  limits). d_feat accumulates into a VMEM-resident f32 block across roi
  chunks, so the whole VJP stays on-chip, and the backward needs no
  sparse table at all.
- Feature maps too large for VMEM residency fall back to the XLA pooler
  via the feasibility gates below (no shipped eval/train scale needs it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CW_SMALL = 24     # small-roi column window
CW_NARROW = 40    # narrow-roi column window
CW_MED = 88       # medium-roi column window
CHUNK = 128       # rois per grid step (fewer grid steps = less per-step
                  # block-switch overhead; meta SMEM + out blocks stay small)
META_N = 54       # int32 scalars per roi (see _roi_meta)
# v5e VMEM is 128 MB; the XLA default scoped cap is 16 MB, raised per-call
# via CompilerParams(vmem_limit_bytes) to the actual block need
# headroom matters: Mosaic's actual scoped-vmem allocation ran ~22 MB above
# this module's block-size estimate (measured: est 103.5 M -> 125.65 M OOM
# at the 124 M hard cap), so the budget stays well under the cap
_VMEM_BUDGET = 90 * 1024 * 1024

# meta layout (per roi): 0 cls, 1 valid, 2 xs_s, 3 xs_n, 4 xs_m,
# 5..11 row_lo, 12..18 row_hi, 19..25 col_lo, 26..32 col_hi,
# 33..39 row_j (sparse-table level; -1 = empty bin),
# 40..46 row_b (second table load = row_hi - 2^row_j),
# 47..53 row_ns (stepped top-level loads for ranges > 2*top span)
# (lo/hi are absolute cell coords clipped to the true map)
_M_CLS, _M_VALID, _M_XSS, _M_XSN, _M_XSM = range(5)
_M_RLO, _M_RHI, _M_CLO, _M_CHI = 5, 12, 19, 26
_M_RJ, _M_RB, _M_RNS = 33, 40, 47


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _neg(dtype):
    return jnp.asarray(jnp.finfo(dtype).min, dtype)


def _neg_th(dtype):
    return jnp.asarray(jnp.finfo(dtype).min, jnp.float32) * 0.5


# ---------------------------------------------------------------------------
# host-side metadata
# ---------------------------------------------------------------------------

def _roi_meta(rois, mask, spatial_scale, h, w, hp, wp, cws, nl):
    """Per-roi int32 metadata [B, P, META_N] (CUDA cell coords + windows +
    sparse-table row lookup plan for the ``nl``-level table)."""
    cells = jnp.floor(rois.astype(jnp.float32) * spatial_scale + 0.5)
    cells = cells.astype(jnp.int32)
    x1, y1, x2, y2 = (cells[..., i] for i in range(4))
    rw = jnp.maximum(x2 - x1 + 1, 1)
    rh = jnp.maximum(y2 - y1 + 1, 1)

    ph = jnp.arange(7, dtype=jnp.int32)
    row_lo = jnp.clip(ph * rh[..., None] // 7 + y1[..., None], 0, h)
    row_hi = jnp.clip(((ph + 1) * rh[..., None] + 6) // 7 + y1[..., None], 0, h)
    col_lo = jnp.clip(ph * rw[..., None] // 7 + x1[..., None], 0, w)
    col_hi = jnp.clip(((ph + 1) * rw[..., None] + 6) // 7 + x1[..., None], 0, w)

    # table lookup plan: j = floor(log2(t)) capped at the top level; two
    # overlapping span-2^j loads cover t <= 2^(j+1); longer ranges (only
    # possible when capped) add ns stepped top-level loads in between
    t = row_hi - row_lo
    j = jnp.minimum(31 - jax.lax.clz(jnp.maximum(t, 1)), nl - 1)
    span = jnp.left_shift(1, j)
    row_b = jnp.maximum(row_hi - span, 0)
    row_ns = jnp.maximum(-(-t // jnp.maximum(span, 1)) - 2, 0)
    row_j = jnp.where(t > 0, j, -1)
    row_ns = jnp.where(t > 0, row_ns, 0)

    cw_s, cw_n, cw_m = cws
    aligned = (jnp.clip(x1, 0, wp - 1) // 8) * 8
    xs_s = jnp.clip(aligned, 0, wp - cw_s)
    xs_n = jnp.clip(aligned, 0, wp - cw_n)
    xs_m = jnp.clip(aligned, 0, wp - cw_m)
    vis_x_hi = jnp.clip(x2 + 1, 0, w)

    fits_s = (vis_x_hi - xs_s) <= cw_s
    fits_n = (vis_x_hi - xs_n) <= cw_n
    fits_m = (vis_x_hi - xs_m) <= cw_m
    cls = jnp.where(fits_s & (cw_s < wp), 0,
                    jnp.where(fits_n & (cw_n < wp), 1,
                              jnp.where(fits_m & (cw_m < wp), 2, 3)))
    head = jnp.stack([cls, mask.astype(jnp.int32), xs_s, xs_n, xs_m],
                     axis=-1)
    return jnp.concatenate([head, row_lo, row_hi, col_lo, col_hi,
                            row_j, row_b, row_ns],
                           axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# kernel building blocks
# ---------------------------------------------------------------------------

def _ms(meta_ref, r, k):
    return meta_ref[0, r, k]


def _build_table(feat_ref, tbl_ref, nl):
    """Row-max sparse table WITHOUT a level-0 copy: slot i holds the max
    over rows [y, y + 2^(i+1)) — span-1 lookups read the feature block
    directly, which saves an hp*wp*ct VMEM slab (the difference between a
    512- and a 256-channel tile at the eval shape). Row tails are filled
    so lookups never touch uninitialized scratch."""
    hp = feat_ref.shape[1]
    for j in range(1, nl):
        d = 1 << (j - 1)
        if j == 1:
            tbl_ref[0, 0:hp - d] = jnp.maximum(feat_ref[0, 0:hp - d],
                                               feat_ref[0, d:hp])
            tbl_ref[0, hp - d:hp] = feat_ref[0, hp - d:hp]
        else:
            tbl_ref[j - 1, 0:hp - d] = jnp.maximum(tbl_ref[j - 2, 0:hp - d],
                                                   tbl_ref[j - 2, d:hp])
            tbl_ref[j - 1, hp - d:hp] = tbl_ref[j - 2, hp - d:hp]


def _rowbins_tbl(meta_ref, feat_ref, tbl_ref, rb_ref, r, xs, cw, nl,
                 dtype):
    """Fill rb_ref[ph, :cw] with the 7 row-bin maxima of roi r via the
    sparse table: two loads per bin (+ a stepped loop only for ranges
    longer than twice the top span). Level-0 (single-row span) candidates
    come from the feature block; pl.when branches on the level so only
    the live pair is loaded (the previous scalar-select form loaded all
    four candidates — half the row-stage VMEM traffic was dead)."""
    ct = feat_ref.shape[-1]
    span = 1 << (nl - 1)
    for ph in range(7):
        jj = _ms(meta_ref, r, _M_RJ + ph)
        aa = _ms(meta_ref, r, _M_RLO + ph)
        bb = _ms(meta_ref, r, _M_RB + ph)

        @pl.when(jj >= 1)
        def _(ph=ph, jj=jj, aa=aa, bb=bb):
            ta = tbl_ref[jj - 1, aa, pl.ds(xs, cw), :].reshape(cw, ct)
            tb = tbl_ref[jj - 1, bb, pl.ds(xs, cw), :].reshape(cw, ct)
            rb_ref[ph, :cw] = jnp.maximum(ta, tb).astype(dtype)

        @pl.when(jj == 0)
        def _(ph=ph, aa=aa, bb=bb):
            fa = feat_ref[0, aa, pl.ds(xs, cw), :].reshape(cw, ct)
            fb = feat_ref[0, bb, pl.ds(xs, cw), :].reshape(cw, ct)
            rb_ref[ph, :cw] = jnp.maximum(fa, fb).astype(dtype)

        @pl.when(jj < 0)
        def _(ph=ph):
            rb_ref[ph, :cw] = jnp.full((cw, ct), _neg(dtype), dtype)

        ns = _ms(meta_ref, r, _M_RNS + ph)

        @pl.when(ns > 0)
        def _(ph=ph, aa=aa, ns=ns):
            def sbody(k, _):
                v = tbl_ref[nl - 2, aa + k * span,
                            pl.ds(xs, cw), :].reshape(cw, ct)
                rb_ref[ph, :cw] = jnp.maximum(rb_ref[ph, :cw],
                                              v.astype(dtype))
                return 0
            jax.lax.fori_loop(1, ns + 1, sbody, 0)


def _col_range(meta_ref, r, pw, xs, cw):
    """The bin's exact column range rel. to the window, plus the aligned
    group base and count (Mosaic requires sublane offsets % 8 == 0, so
    columns are visited in 8-wide aligned groups with an iota mask)."""
    clo = jnp.clip(_ms(meta_ref, r, _M_CLO + pw) - xs, 0, cw)
    chi = jnp.clip(_ms(meta_ref, r, _M_CHI + pw) - xs, 0, cw)
    g0 = (clo // 8) * 8
    ng = jnp.maximum((chi - g0 + 7) // 8, 0)
    return clo, chi, g0, ng


def _colbins(meta_ref, rb_ref, r, xs, cw):
    """[7, 7, CT] bin maxima from the row-bin scratch: per column-bin,
    masked maxes over the bin's exact 8-aligned column groups."""
    ct = rb_ref.shape[-1]
    dtype = rb_ref.dtype
    res_cols = []
    for pw in range(7):
        clo, chi, g0, ng = _col_range(meta_ref, r, pw, xs, cw)

        def body(g, acc):
            base = pl.multiple_of(g0 + 8 * g, 8)
            grp = rb_ref[:, pl.ds(base, 8), :]          # [7, 8, CT]
            ci = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1) + base
            m = (ci >= clo) & (ci < chi)
            red = jnp.max(jnp.where(m, grp, _neg(dtype)), axis=1)
            return jnp.maximum(acc, red)

        acc = jax.lax.fori_loop(
            0, ng, body, jnp.full((7, ct), _neg(dtype), dtype))
        res_cols.append(acc[:, None, :])
    return jnp.concatenate(res_cols, axis=1)           # [7, 7, CT]


def _finalize(res, valid):
    # nested wheres: no i1 AND between a scalar and a broadcast vector
    out = jnp.where(res.astype(jnp.float32) > _neg_th(res.dtype), res,
                    jnp.zeros_like(res))
    return jnp.where(valid, out, jnp.zeros_like(out))


def _fwd_kernel(meta_ref, feat_ref, out_ref, tbl_ref, rb_ref, *, wp, cws,
                nl):
    rc = pl.program_id(2)

    @pl.when(rc == 0)
    def _():
        _build_table(feat_ref, tbl_ref, nl)

    # rois iterate via fori_loop (not a Python unroll): the kernel program
    # contains ONE roi body per class, keeping the Mosaic compile
    # tractable (a 32-roi unroll took 16+ min to compile; an interleaved
    # 4-roi unroll compiled but ran 2.5x SLOWER — register pressure)
    def body(r, _):
        cls = _ms(meta_ref, r, _M_CLS)
        valid = _ms(meta_ref, r, _M_VALID) > 0

        @pl.when(~valid)
        def _():
            out_ref[0, r] = jnp.zeros(out_ref.shape[2:], out_ref.dtype)

        def run(cw, xs_slot):
            xs = (pl.multiple_of(_ms(meta_ref, r, xs_slot), 8)
                  if xs_slot is not None else 0)
            _rowbins_tbl(meta_ref, feat_ref, tbl_ref, rb_ref, r, xs, cw,
                         nl, feat_ref.dtype)
            res = _colbins(meta_ref, rb_ref, r, xs, cw)
            out_ref[0, r] = _finalize(res, valid).astype(out_ref.dtype)

        for ci, (cw, slot) in enumerate(
                zip(cws, (_M_XSS, _M_XSN, _M_XSM))):
            if cw < wp:
                @pl.when(valid & (cls == ci))
                def _(cw=cw, slot=slot):
                    run(cw, slot)

        @pl.when(valid & (cls == 3))
        def _():
            run(wp, None)

        return 0

    jax.lax.fori_loop(0, CHUNK, body, 0)


_BIGKEY = 3.0e7   # > hp*wp for any feasible map; exact in f32


def _bwd_kernel(meta_ref, feat_ref, g_ref, dfeat_ref, rb_ref, ry_ref,
                drb_ref, *, wp, cws):
    """v5 backward: CUDA first-argmax routing (ROIPool_cuda.cu stores the
    argmax in the forward and scatters the cotangent to that single cell;
    `if (val > maxval)` scanning y-then-x keeps the FIRST row-major
    maximum). Routing to one cell per bin lets the whole backward run in
    ONE raw row sweep + one cheap iota-routed sweep:

      1. per row-bin: a raw (max, first-argmax-row) scan over the bin's
         rows -> rb (column maxes) + ry (each column's first max row).
         Replaces the v4 sparse-table recompute AND kills the table
         build/VMEM entirely in the backward.
      2. per column-bin: one merge pass over the 8-aligned groups tracking
         (bin max, min row-major key) where key = ry*wp + x — the minimal
         key IS the CUDA argmax cell (min row, then min column; a column's
         first-max row equals the bin's first row iff that column attains
         the max there).
      3. route g into drb at column x* = key mod wp by an iota compare
         (no rb loads — v4's value-equality route pass re-read rb).
      4. one row sweep adds drb * (y == ry) into the resident d_feat —
         v4 needed TWO raw sweeps here (tie count, then route) plus the
         even-split divisions.

    v4 split ties evenly per reduction stage (the composed jnp reduce-max
    VJP convention); v5 routes each bin's full cotangent to the CUDA
    argmax cell — bit-parity with the reference kernel, including bf16
    ties. All routing arithmetic is f32 (exact for bf16 features; bf16
    compare masks trip Mosaic i1-relayout limits).
    """
    rc = pl.program_id(2)

    @pl.when(rc == 0)
    def _():
        dfeat_ref[...] = jnp.zeros(dfeat_ref.shape, dfeat_ref.dtype)

    ct = feat_ref.shape[-1]
    negf = _neg(jnp.float32)

    def body(r, _):
        cls = _ms(meta_ref, r, _M_CLS)
        valid = _ms(meta_ref, r, _M_VALID) > 0

        def run(cw, xs_slot):
            xs = (pl.multiple_of(_ms(meta_ref, r, xs_slot), 8)
                  if xs_slot is not None else 0)
            # 1) raw (max, first-argmax-row) scan per row-bin
            for ph in range(7):
                lo = _ms(meta_ref, r, _M_RLO + ph)
                hi = _ms(meta_ref, r, _M_RHI + ph)

                def scan_body(y, carry):
                    m, my = carry
                    row = feat_ref[0, y, pl.ds(xs, cw), :].reshape(
                        cw, ct).astype(jnp.float32)
                    gt = jnp.where(row > m, 1.0, 0.0)   # strict: keep FIRST
                    my = my * (1.0 - gt) + y.astype(jnp.float32) * gt
                    return jnp.maximum(m, row), my

                m, my = jax.lax.fori_loop(
                    lo, hi, scan_body,
                    (jnp.full((cw, ct), negf, jnp.float32),
                     jnp.zeros((cw, ct), jnp.float32)))
                rb_ref[ph, :cw] = m
                ry_ref[ph, :cw] = my
            drb_ref[:, :cw] = jnp.zeros((7, cw, ct), jnp.float32)

            # 2+3) per column-bin: (max, min-key) merge, then iota route
            for pw in range(7):
                clo, chi, g0, ng = _col_range(meta_ref, r, pw, xs, cw)

                def mk_body(gi, carry):
                    amax, akey = carry
                    base = pl.multiple_of(g0 + 8 * gi, 8)
                    grp = rb_ref[:, pl.ds(base, 8), :]   # [7, 8, CT] f32
                    gry = ry_ref[:, pl.ds(base, 8), :]
                    ci = jax.lax.broadcasted_iota(
                        jnp.int32, (1, 8, 1), 1) + base
                    inb = jnp.where((ci >= clo) & (ci < chi), 1.0, 0.0)
                    vals = jnp.where(inb > 0, grp, negf)
                    gm = jnp.max(vals, axis=1)           # [7, CT]
                    key = gry * float(wp) + ci.astype(jnp.float32)
                    tied = jnp.where(vals == gm[:, None, :], key, _BIGKEY)
                    tied = jnp.where(inb > 0, tied, _BIGKEY)
                    gk = jnp.min(tied, axis=1)           # [7, CT]
                    better = jnp.where(gm > amax, 1.0, 0.0)
                    eqm = jnp.where(gm == amax, 1.0, 0.0) * (1.0 - better)
                    akey = (better * gk + eqm * jnp.minimum(akey, gk)
                            + (1.0 - better - eqm) * akey)
                    return jnp.maximum(amax, gm), akey

                amax, akey = jax.lax.fori_loop(
                    0, ng, mk_body,
                    (jnp.full((7, ct), negf, jnp.float32),
                     jnp.full((7, ct), _BIGKEY, jnp.float32)))
                live = jnp.where(amax > _neg_th(jnp.float32), 1.0, 0.0)
                d = g_ref[0, r, :, pw, :] * live         # [7, CT]
                xstar = akey - jnp.floor(akey / float(wp)) * float(wp)

                def rt_body(gi, _):
                    base = pl.multiple_of(g0 + 8 * gi, 8)
                    ci = (jax.lax.broadcasted_iota(
                        jnp.int32, (1, 8, 1), 1) + base).astype(jnp.float32)
                    hit = jnp.where(ci == xstar[:, None, :], 1.0, 0.0)
                    cur = drb_ref[:, pl.ds(base, 8), :]
                    drb_ref[:, pl.ds(base, 8), :] = cur + hit * d[:, None, :]
                    return 0

                jax.lax.fori_loop(0, ng, rt_body, 0)

            # 4) one row sweep: each column's mass lands on its first
            #    max row (the bin argmax cell is (ry[x*], x*))
            for ph in range(7):
                lo = _ms(meta_ref, r, _M_RLO + ph)
                hi = _ms(meta_ref, r, _M_RHI + ph)
                dd = drb_ref[ph, :cw]                    # [cw, CT]
                ryv = ry_ref[ph, :cw]

                def rr_body(y, _, dd=dd, ryv=ryv):
                    hit = jnp.where(ryv == y.astype(jnp.float32), 1.0, 0.0)
                    cur = dfeat_ref[0, y, pl.ds(xs, cw), :].reshape(cw, ct)
                    dfeat_ref[0, y, pl.ds(xs, cw), :] = cur + dd * hit
                    return 0

                jax.lax.fori_loop(lo, hi, rr_body, 0)

        for ci, (cw, slot) in enumerate(
                zip(cws, (_M_XSS, _M_XSN, _M_XSM))):
            if cw < wp:
                @pl.when(valid & (cls == ci))
                def _(cw=cw, slot=slot):
                    run(cw, slot)

        @pl.when(valid & (cls == 3))
        def _():
            run(wp, None)

        return 0

    jax.lax.fori_loop(0, CHUNK, body, 0)


# ---------------------------------------------------------------------------
# feasibility gates + host wrappers
# ---------------------------------------------------------------------------

def _padded_dims(h, w):
    hp = max(_round_up(h, 8), 8)
    wp = max(_round_up(w, 8), CW_SMALL)
    return hp, wp


def _cws(wp):
    return (min(CW_SMALL, wp), min(CW_NARROW, wp), min(CW_MED, wp))


def _nl_full(hp: int) -> int:
    """Levels so the top span covers any in-map range: 2^(nl-1) <= hp."""
    return max(int(hp).bit_length(), 2)


def _plan(c, hp, wp, itemsize, bwd):
    """(nl, ct): the largest channel tile, then the deepest sparse table,
    that fit the VMEM budget. Bigger tiles mean fewer grid passes (the
    per-roi scalar work repeats per tile); deeper tables mean fewer
    stepped loads for tall rois."""
    if c % 128 != 0:
        return _nl_full(hp), c  # interpret-mode tests only
    nl_top = _nl_full(hp)
    for ct in (512, 256, 128):
        if c % ct:
            continue
        for nl in range(nl_top, 2, -1):
            if _vmem_need(hp, wp, ct, itemsize, bwd, nl) <= _VMEM_BUDGET:
                return nl, ct
    return 3, 128


def _vmem_need(hp, wp, ct, itemsize, bwd, nl):
    feat = 2 * hp * wp * ct * itemsize
    # v5 backward builds no sparse table (one raw scan replaces it)
    tbl = 0 if bwd else (nl - 1) * hp * wp * ct * itemsize
    out = 2 * CHUNK * 49 * ct * (4 if bwd else itemsize)
    scratch = 7 * wp * ct * (12 if bwd else itemsize)
    dfeat = 2 * hp * wp * ct * 4 if bwd else 0
    return feat + tbl + out + scratch + dfeat + (2 << 20)


def pallas_pool_feasible(h: int, w: int, c: int, itemsize: int = 2) -> bool:
    """True if the feature block + a (possibly shallow) sparse table fit
    VMEM (128 MB on v5e) at the minimum lane-aligned channel tile — covers
    every reference image/TTA scale; the XLA pooler remains only as an
    off-TPU fallback."""
    if c % 128 != 0:
        return False
    hp, wp = _padded_dims(h, w)
    return _vmem_need(hp, wp, 128, itemsize, bwd=False,
                      nl=3) <= _VMEM_BUDGET


def pallas_pool_bwd_feasible(h: int, w: int, c: int, itemsize: int = 2) -> bool:
    """The backward additionally keeps an f32 d_feat block resident."""
    if c % 128 != 0:
        return False
    hp, wp = _padded_dims(h, w)
    return _vmem_need(hp, wp, 128, itemsize, bwd=True, nl=3) <= _VMEM_BUDGET


def _prep(feat, rois, roi_mask, spatial_scale, bwd):
    b, h, w, c = feat.shape
    hp, wp = _padded_dims(h, w)
    cws = _cws(wp)
    nl, ct = _plan(c, hp, wp, jnp.dtype(feat.dtype).itemsize, bwd)
    p = rois.shape[1]
    pad_p = (-p) % CHUNK
    rois_p = jnp.pad(rois, ((0, 0), (0, pad_p), (0, 0)))
    mask_p = jnp.pad(roi_mask, ((0, 0), (0, pad_p)))
    meta = _roi_meta(rois_p, mask_p, spatial_scale, h, w, hp, wp, cws, nl)
    feat_p = jnp.pad(feat, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    return feat_p, meta, hp, wp, cws, nl, ct, p, pad_p


def _run_fwd(feat_p, meta, hp, wp, cws, nl, ct, interpret=False):
    b, _, _, c = feat_p.shape
    pp = meta.shape[1]
    isz = jnp.dtype(feat_p.dtype).itemsize
    grid = (b, c // ct, pp // CHUNK)
    kernel = functools.partial(_fwd_kernel, wp=wp, cws=cws, nl=nl)
    params = pltpu.CompilerParams(
        # Mosaic's real scoped allocation runs ~21 MB above the block-size
        # estimate (measured); the margin must cover it
        vmem_limit_bytes=min(
            _vmem_need(hp, wp, ct, isz, False, nl) + (34 << 20),
            124 * 1024 * 1024))
    return pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=None if interpret else params,
        in_specs=[
            pl.BlockSpec((1, CHUNK, META_N), lambda bi, ci, ri: (bi, ri, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hp, wp, ct), lambda bi, ci, ri: (bi, 0, 0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, CHUNK, 7, 7, ct),
                               lambda bi, ci, ri: (bi, ri, 0, 0, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, pp, 7, 7, c), feat_p.dtype),
        scratch_shapes=[pltpu.VMEM((max(nl - 1, 1), hp, wp, ct),
                                   feat_p.dtype),
                        pltpu.VMEM((7, wp, ct), feat_p.dtype)],
        interpret=interpret,
    )(meta, feat_p)


def _run_bwd(feat_p, meta, g_p, hp, wp, cws, nl, ct, interpret=False):
    b, _, _, c = feat_p.shape
    pp = meta.shape[1]
    isz = jnp.dtype(feat_p.dtype).itemsize
    grid = (b, c // ct, pp // CHUNK)
    kernel = functools.partial(_bwd_kernel, wp=wp, cws=cws)
    params = pltpu.CompilerParams(
        vmem_limit_bytes=min(
            _vmem_need(hp, wp, ct, isz, True, nl) + (34 << 20),
            124 * 1024 * 1024))
    return pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=None if interpret else params,
        in_specs=[
            pl.BlockSpec((1, CHUNK, META_N), lambda bi, ci, ri: (bi, ri, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hp, wp, ct), lambda bi, ci, ri: (bi, 0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK, 7, 7, ct),
                         lambda bi, ci, ri: (bi, ri, 0, 0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hp, wp, ct),
                               lambda bi, ci, ri: (bi, 0, 0, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), jnp.float32),
        # rb/ry/drb scratches f32: the backward routing compares in f32
        # (exact for bf16 inputs) to avoid Mosaic i1-relayout limits on
        # bf16; v5 needs no sparse table in the backward
        scratch_shapes=[pltpu.VMEM((7, wp, ct), jnp.float32),
                        pltpu.VMEM((7, wp, ct), jnp.float32),
                        pltpu.VMEM((7, wp, ct), jnp.float32)],
        interpret=interpret,
    )(meta, feat_p, g_p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def roi_pool_tpu(feat, rois, roi_mask, spatial_scale, pooled=7):
    """Exact ROIPool (CUDA semantics) on TPU.

    feat [B,H,W,C] (C % 128 == 0), rois [B,P,4] xyxy image coords,
    roi_mask [B,P] bool -> [B,P,7,7,C]. Gate with pallas_pool_feasible
    (and pallas_pool_bwd_feasible when differentiating).
    """
    out, _ = _roi_pool_tpu_fwd(feat, rois, roi_mask, spatial_scale, pooled)
    return out


def _roi_pool_tpu_fwd(feat, rois, roi_mask, spatial_scale, pooled):
    assert pooled == 7, "kernel is specialized to the shipped 7x7 pooler"
    feat_p, meta, hp, wp, cws, nl, ct, p, pad_p = _prep(
        feat, rois, roi_mask, spatial_scale, bwd=False)
    out = _run_fwd(feat_p, meta, hp, wp, cws, nl, ct)
    return out[:, :p], (feat, rois, roi_mask)


def _roi_pool_tpu_bwd(spatial_scale, pooled, residuals, g):
    feat, rois, roi_mask = residuals
    b, h, w, c = feat.shape
    feat_p, meta, hp, wp, cws, nl, ct, p, pad_p = _prep(
        feat, rois, roi_mask, spatial_scale, bwd=True)
    g_p = jnp.pad(g.astype(jnp.float32),
                  ((0, 0), (0, pad_p), (0, 0), (0, 0), (0, 0)))
    d = _run_bwd(feat_p, meta, g_p, hp, wp, cws, nl, ct)
    return d[:, :h, :w, :].astype(feat.dtype), None, None


roi_pool_tpu.defvjp(_roi_pool_tpu_fwd, _roi_pool_tpu_bwd)
