"""Fused Pallas Winograd: hardware validation + per-layer timing.

Runs every Winograd-eligible VGG16-OICR layer shape at the eval bench
resolution (832x1344): numeric drift vs XLA direct bf16 conv, then
chained timing vs direct. Smallest shapes first (compile feasibility).

    python -u tools/bench_wino.py [--ty 4]
"""

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ty", type=int, default=4)
    ap.add_argument("--cases", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from odwscl_tpu.ops import winograd_pallas as wp

    print(jax.devices(), flush=True)

    # (tag, B, H, W, Cin, Cout, dilation) — eval bench resolution /8 etc.
    cases = [
        ("conv4_2 512 @104x168", 8, 104, 168, 512, 512, 1),
        ("conv5_2 512 d2 @104x168", 8, 104, 168, 512, 512, 2),
        ("conv3_2 256 @208x336", 8, 208, 336, 256, 256, 1),
        ("conv3_1 128->256 @208x336", 8, 208, 336, 128, 256, 1),
        ("conv4_1 256->512 @104x168", 8, 104, 168, 256, 512, 1),
        ("conv2_2 128 @416x672", 8, 416, 672, 128, 128, 1),
    ]
    if args.cases:
        keep = args.cases.split(",")
        cases = [c for c in cases if any(k in c[0] for k in keep)]

    dn_cache = {}

    def direct(x, k, b, dil):
        key = (x.shape, k.shape)
        if key not in dn_cache:
            dn_cache[key] = jax.lax.conv_dimension_numbers(
                x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, k.astype(jnp.bfloat16), (1, 1), [(dil, dil), (dil, dil)],
            rhs_dilation=(dil, dil), dimension_numbers=dn_cache[key],
            preferred_element_type=jnp.float32)
        return (y + b).astype(jnp.bfloat16)

    for tag, b, h, w, cin, cout, dil in cases:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(b, h, w, cin), jnp.bfloat16)
        k = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.float32)
        bias = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)
        wfn = (wp.winograd_conv3x3_d2_pallas if dil == 2
               else wp.winograd_conv3x3_pallas)

        feas = wp.winograd_pallas_feasible(
            h if dil == 1 else h // 2, w if dil == 1 else w // 2,
            cin, cout, args.ty)
        print(f"{tag}: feasible={feas}", flush=True)
        if not feas:
            continue

        y_w = wfn(x, k, bias, ty=args.ty)
        y_d = direct(x, k, bias, dil)
        ref = y_d.astype(jnp.float32)
        scale = float(jnp.max(jnp.abs(ref)))
        err = float(jnp.max(jnp.abs(y_w.astype(jnp.float32) - ref))) / scale
        print(f"  rel err vs direct bf16: {err:.4f}", flush=True)

        # (the r3 "v2" phase-layout XLA variant measured 0.15-0.29x of
        # direct and was deleted in round 4 — NOTES.md)
        t_w = chain(lambda xx: wfn(xx, k, bias, ty=args.ty), (x,))
        t_d = chain(lambda xx: direct(xx, k, bias, dil), (x,))
        print(f"  pallas {t_w*1e3:7.2f} ms | "
              f"direct {t_d*1e3:7.2f} ms | speedup {t_d/t_w:.2f}x",
              flush=True)


if __name__ == "__main__":
    import sys
    sys.path.insert(0, "/root/repo")
    main()
