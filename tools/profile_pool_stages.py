"""Attribute the Pallas RoIPool forward's time to its stages on TPU.

Builds kernel variants from roi_pool_pallas's real building blocks —
full / rows-only (row-bin fill + out write, no column reduction) /
cols-only (column reduction over uninitialized scratch, no row fill) /
write-only (meta reads + out write) — and times each at the bench shape.
The deltas attribute the per-roi cost; every variant keeps the same grid,
blocks and out traffic so only the stage under test differs.

    PYTHONPATH=/root/repo:/root/.axon_site python -u tools/profile_pool_stages.py
"""

import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import odwscl_tpu.ops.roi_pool_pallas as rp

    b, h, w, c, p = 8, 104, 168, 512, 2048
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(b, h, w, c), jnp.bfloat16)
    x1y1 = rng.uniform(0, 1000, (b, p, 2))
    wh = rng.uniform(16, 300, (b, p, 2))
    rois = jnp.asarray(np.concatenate(
        [x1y1, np.minimum(x1y1 + wh, [1332, 799])], -1), jnp.float32)
    mask = jnp.ones((b, p), bool)

    def make_kernel(stage, wp, cws, nl):
        def kern(meta_ref, feat_ref, out_ref, tbl_ref, rb_ref):
            rc = pl.program_id(2)

            @pl.when(rc == 0)
            def _():
                rp._build_table(feat_ref, tbl_ref, nl)

            ct = feat_ref.shape[-1]

            def body(r, _):
                cls = rp._ms(meta_ref, r, rp._M_CLS)
                valid = rp._ms(meta_ref, r, rp._M_VALID) > 0

                def run(cw, xs_slot):
                    xs = (pl.multiple_of(rp._ms(meta_ref, r, xs_slot), 8)
                          if xs_slot is not None else 0)
                    if stage in ("full", "rows"):
                        rp._rowbins_tbl(meta_ref, feat_ref, tbl_ref, rb_ref,
                                        r, xs, cw, nl, feat_ref.dtype)
                    if stage in ("full", "cols"):
                        res = rp._colbins(meta_ref, rb_ref, r, xs, cw)
                    elif stage == "rows":
                        rowred = jnp.max(rb_ref[:, 0:8, :], axis=1)
                        res = jnp.broadcast_to(rowred[:, None, :], (7, 7, ct))
                    else:
                        res = jnp.zeros((7, 7, ct), feat_ref.dtype)
                    out_ref[0, r] = rp._finalize(res, valid).astype(
                        out_ref.dtype)

                for ci, (cw, slot) in enumerate(
                        zip(cws, (rp._M_XSS, rp._M_XSN, rp._M_XSM))):
                    if cw < wp:
                        @pl.when(valid & (cls == ci))
                        def _(cw=cw, slot=slot):
                            run(cw, slot)

                @pl.when(valid & (cls == 3))
                def _():
                    run(wp, None)

                return 0

            jax.lax.fori_loop(0, rp.CHUNK, body, 0)
        return kern

    def run_variant(stage):
        feat_p, meta, hp, wp, cws, nl, ct, pn, pad_p = rp._prep(
            feat, rois, mask, 0.125, bwd=False)
        isz = 2
        grid = (b, c // ct, meta.shape[1] // rp.CHUNK)
        params = pltpu.CompilerParams(vmem_limit_bytes=min(
            rp._vmem_need(hp, wp, ct, isz, False, nl) + (34 << 20),
            124 * 1024 * 1024))
        kernel = make_kernel(stage, wp, cws, nl)
        call = pl.pallas_call(
            kernel, grid=grid, compiler_params=params,
            in_specs=[
                pl.BlockSpec((1, rp.CHUNK, rp.META_N),
                             lambda bi, ci, ri: (bi, ri, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, hp, wp, ct),
                             lambda bi, ci, ri: (bi, 0, 0, ci),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rp.CHUNK, 7, 7, ct),
                                   lambda bi, ci, ri: (bi, ri, 0, 0, ci),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (b, meta.shape[1], 7, 7, c), feat_p.dtype),
            scratch_shapes=[pltpu.VMEM((max(nl - 1, 1), hp, wp, ct),
                                       feat_p.dtype),
                            pltpu.VMEM((7, wp, ct), feat_p.dtype)],
        )

        @jax.jit
        def chained(f, m):
            def lbody(i, acc):
                ff = f + (acc * 1e-30).astype(f.dtype)
                out = call(m, ff)
                return acc + out.astype(jnp.float32).sum() * 1e-20
            return jax.lax.fori_loop(0, 8, lbody, jnp.float32(0.0))

        float(chained(feat_p, meta))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(feat_p, meta))
            best = min(best, time.perf_counter() - t0)
        print(f"{stage:10s}: {best / 8 * 1e3:7.2f} ms  (nl={nl}, ct={ct})",
              flush=True)

    for stage in ("write", "rows", "cols", "full"):
        run_variant(stage)


if __name__ == "__main__":
    main()
