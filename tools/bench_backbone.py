"""Backbone variant shootout on TPU (chained timing) + numeric drift.

Variants: stem (shifted-GEMM vs nn.Conv), conv impl (direct vs Winograd
F(4,3) at >=256 / >=128 channels). Prints ms/batch at the bench shape and
max relative feature drift vs the direct-f32-ish baseline.

    python -u tools/bench_backbone.py
"""

import time

import numpy as np


def chain_time(apply_fn, params, x, iters=8, reps=2):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(pr, xx):
        def body(i, acc):
            out = apply_fn(pr, xx + (acc * 1e-30).astype(xx.dtype))
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-12
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(chained(params, x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chained(params, x))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    import jax
    import jax.numpy as jnp
    from odwscl_tpu.models.vgg16 import VGGBackbone

    b, h, w = 8, 832, 1344
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(b, h, w, 3), jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    base = VGGBackbone()
    params = jax.jit(base.init)(key, images)

    ref = None
    variants = [
        # (the conv_impl="winograd" XLA variants measured 0.15-0.29x of
        # direct and were deleted in round 4 — NOTES.md)
        ("direct + nn.Conv stem (current)", dict()),
        ("direct + gemm-stem", dict(stem_gemm=True)),
        ("int8 convs (serving)", dict(int8_eval=True)),
    ]
    for tag, kw in variants:
        m = VGGBackbone(**kw)
        fe = bool(kw.get("int8_eval"))
        t = chain_time(lambda pr, xx, m=m, fe=fe: m.apply(pr, xx,
                                                          fast_eval=fe),
                       params, images)
        out = jax.jit(lambda pr, xx, m=m, fe=fe: m.apply(
            pr, xx, fast_eval=fe))(params, images)
        outf = np.asarray(out[:1, :16].astype(jnp.float32))
        if ref is None:
            ref = outf
            drift = 0.0
        else:
            drift = float(np.abs(outf - ref).max() / (np.abs(ref).max()))
        print(f"{tag:34s}: {t*1e3:7.2f} ms/batch  drift={drift:.2e}")


if __name__ == "__main__":
    main()
