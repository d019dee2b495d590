"""Profile the Pallas RoIPool forward: where does the time go?

Times the real kernel, then hacked variants (rows-only, cols-only), at the
bench eval shape. Informs the v4 kernel design (pyramid row stage?).

    PYTHONPATH=/root/repo:/root/.axon_site python -u tools/profile_pool.py
"""

import time

import numpy as np


def chain(fn, args, iters=8, reps=2):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(*a):
        def body(i, acc):
            out = fn(a[0] + (acc * 1e-30).astype(a[0].dtype), *a[1:])
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-12
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(chained(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def make_inputs(b=8, h=104, w=168, c=512, p=2048, seed=0, max_px=1200):
    import jax.numpy as jnp
    rng = np.random.RandomState(seed)
    feat = jnp.asarray(rng.randn(b, h, w, c), jnp.bfloat16)
    x1y1 = rng.uniform(0, 1000, (b, p, 2))
    wh = rng.uniform(16, 300, (b, p, 2))
    rois = jnp.asarray(np.concatenate(
        [x1y1, np.minimum(x1y1 + wh, [w * 8 - 12, h * 8 - 12])], -1),
        jnp.float32)
    mask = jnp.ones((b, p), bool)
    return feat, rois, mask


def main():
    import jax
    from odwscl_tpu.ops import roi_pool_pallas as rp

    feat, rois, mask = make_inputs()

    t = chain(lambda f: rp.roi_pool_tpu(f, rois, mask, 0.125), (feat,))
    print(f"full fwd           : {t*1e3:7.2f} ms/batch", flush=True)

    # rows-only: skip the column stage (write rowbin slice as output)
    import functools
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def _fwd_rows_only(meta_ref, feat_ref, out_ref, rb_ref, *, wp, cws):
        def body(r, _):
            cls = rp._ms(meta_ref, r, rp._M_CLS)
            valid = rp._ms(meta_ref, r, rp._M_VALID) > 0

            def run(cw, xs_slot):
                xs = (pl.multiple_of(rp._ms(meta_ref, r, xs_slot), 8)
                      if xs_slot is not None else 0)
                rp._rowbins(meta_ref, feat_ref, rb_ref, r, xs, cw,
                            feat_ref.dtype)
                res = rb_ref[:, 0:8:8+(-7), :] if False else rb_ref[:, 0:1, :]
                res = jnp.broadcast_to(res, (7, 7, rb_ref.shape[-1]))
                out_ref[0, r] = rp._finalize(res, valid).astype(out_ref.dtype)

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

    def _fwd_cols_only(meta_ref, feat_ref, out_ref, rb_ref, *, wp, cws):
        def body(r, _):
            cls = rp._ms(meta_ref, r, rp._M_CLS)
            valid = rp._ms(meta_ref, r, rp._M_VALID) > 0

            def run(cw, xs_slot):
                xs = (pl.multiple_of(rp._ms(meta_ref, r, xs_slot), 8)
                      if xs_slot is not None else 0)
                # fake row stage: one 8-row strip only
                for ph in range(7):
                    rb_ref[ph, :cw] = feat_ref[0, ph, pl.ds(xs, cw), :]\
                        .reshape(cw, feat_ref.shape[-1]).astype(rb_ref.dtype)
                res = rp._colbins(meta_ref, rb_ref, r, xs, cw)
                out_ref[0, r] = rp._finalize(res, valid).astype(out_ref.dtype)

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

    for tag, kern in (("rows-only (no col stage)", _fwd_rows_only),
                      ("cols-only (1-strip rows)", _fwd_cols_only)):
        def run_variant(f, kern=kern):
            feat_p, meta, hp, wp, cws, p_, pad_p = rp._prep(
                f, rois, mask, 0.125)
            b, _, _, c = feat_p.shape
            pp = meta.shape[1]
            isz = jnp.dtype(feat_p.dtype).itemsize
            ct = rp._ct(c, hp, wp, isz, bwd=False)
            from jax.experimental.pallas import tpu as pltpu
            params = pltpu.CompilerParams(
                vmem_limit_bytes=min(
                    rp._vmem_need(hp, wp, ct, isz, False) + (24 << 20),
                    124 * 1024 * 1024))
            return pl.pallas_call(
                functools.partial(kern, wp=wp, cws=cws),
                grid=(b, c // ct, pp // rp.CHUNK),
                compiler_params=params,
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
                out_shape=jax.ShapeDtypeStruct((b, pp, 7, 7, c),
                                               feat_p.dtype),
                scratch_shapes=[pltpu.VMEM((7, wp, ct), feat_p.dtype)],
            )(meta, feat_p)

        t = chain(run_variant, (feat,))
        print(f"{tag:19s}: {t*1e3:7.2f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
