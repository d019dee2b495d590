"""Measure the s2d stem vs the direct stem at the bench shape, in-graph.

    python -u tools/profile_s2d.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from odwscl_tpu.ops.s2d_stem import stem_s2d, _stem_w1, _stem_w2

    b, h, w = 8, 832, 1344
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, 3), jnp.bfloat16)
    k1 = jnp.asarray(rng.randn(3, 3, 3, 64) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)

    def direct(x, k1, b1, k2, b2):
        y = x
        for k, bb in ((k1, b1), (k2, b2)):
            y = jax.lax.conv_general_dilated(
                y, k.astype(jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = jnp.maximum(y + bb.astype(jnp.bfloat16), 0)
        return jax.lax.reduce_window(y, -jnp.inf, jax.lax.max,
                                     (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    def s2d_full(x, k1, b1, k2, b2):
        return stem_s2d(x, k1, b1, k2, b2)

    def s2d_conv1_only(x, k1, b1, k2, b2):
        # first half of the s2d path: phase-batched 4x4/stride-2 conv1_1
        w1 = _stem_w1(k1).astype(jnp.bfloat16)
        xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
        y1 = jax.lax.conv_general_dilated(
            xp, w1, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.maximum(y1 + jnp.tile(b1, 4).astype(jnp.bfloat16), 0)

    def s2d_conv2_only(y1, k2, b2):
        # second half: phase conv + 4-way max
        bb_, h2, w2, _ = y1.shape
        w2k = _stem_w2(k2).astype(jnp.bfloat16)
        y1p = jnp.pad(y1, ((0, 0), (1, 1), (1, 1), (0, 0)))
        z = jax.lax.conv_general_dilated(
            y1p, w2k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = None
        for p in range(2):
            for q in range(2):
                g = z[:, p:p + h2, q:q + w2, (p * 2 + q) * 64:(p * 2 + q + 1) * 64]
                out = g if out is None else jnp.maximum(out, g)
        return jnp.maximum(out + b2.astype(jnp.bfloat16), 0)

    def chain(fn, args, iters=8, reps=3):
        @jax.jit
        def chained(*a):
            def body(i, acc):
                first = a[0] + (acc * 1e-30).astype(a[0].dtype)
                out = fn(first, *a[1:])
                return acc + out.astype(jnp.float32).sum() * 1e-12
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        float(chained(*args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chained(*args))
            best = min(best, time.perf_counter() - t0)
        return best / iters * 1e3

    print(f"direct stem : {chain(direct, (x, k1, b1, k2, b2)):7.2f} ms",
          flush=True)
    print(f"s2d full    : {chain(s2d_full, (x, k1, b1, k2, b2)):7.2f} ms",
          flush=True)
    print(f"s2d conv1   : {chain(s2d_conv1_only, (x, k1, b1, k2, b2)):7.2f} ms",
          flush=True)
    y1 = jax.jit(s2d_conv1_only)(x, k1, b1, k2, b2)
    print(f"s2d conv2   : {chain(s2d_conv2_only, (y1, k2, b2)):7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
