"""Hardware validation + timing of the fused conv1_2+pool kernel and
conv1_1 XLA variants.

    python -u tools/bench_stem.py
"""

import time

import numpy as np


def chain(fn, args, iters=8, reps=2):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(*a):
        def body(i, acc):
            x = a[0] + (acc * 0).astype(a[0].dtype)
            out = fn(x, *a[1:])
            return acc + out.astype(jnp.float32).sum() * 1e-12
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(chained(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    import jax
    import jax.numpy as jnp
    from odwscl_tpu.ops.stem_fused import conv12_pool_fused

    def conv(x, w, b_):
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=dn)
        return jax.nn.relu(y + b_.astype(jnp.bfloat16))

    def direct12(y1, w2, b2):
        y = conv(y1, w2, b2)
        b, h, w, c = y.shape
        return y.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))

    rng = np.random.RandomState(0)
    b, h, w = 8, 832, 1344
    x = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
    xb = x.astype(jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(3, 3, 3, 64).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    y1 = jax.jit(conv)(xb, w1, b1)

    # correctness on hardware first
    got = np.asarray(jax.jit(conv12_pool_fused)(y1, w2, b2)[:1, :8, :8],
                     np.float32)
    ref = np.asarray(jax.jit(direct12)(y1, w2, b2)[:1, :8, :8], np.float32)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
    print(f"correctness (8x8 corner): rel err {err:.2e}", flush=True)
    # seam rows (pool rows 15-16 straddle the strip boundary)
    got2 = np.asarray(jax.jit(conv12_pool_fused)(y1, w2, b2)[:1, 14:18, :8],
                      np.float32)
    ref2 = np.asarray(jax.jit(direct12)(y1, w2, b2)[:1, 14:18, :8],
                      np.float32)
    err2 = np.abs(got2 - ref2).max() / (np.abs(ref2).max() + 1e-6)
    print(f"correctness (strip seam) : rel err {err2:.2e}", flush=True)

    t_f = chain(conv12_pool_fused, (y1, w2, b2))
    print(f"fused conv1_2+pool : {t_f*1e3:7.2f} ms/batch", flush=True)
    t_d = chain(direct12, (y1, w2, b2))
    print(f"direct XLA         : {t_d*1e3:7.2f} ms/batch "
          f"(speedup {t_d/t_f:.2f}x)", flush=True)

    # conv1_1 variants
    t_c1 = chain(lambda xx: conv(xx, w1, b1), (xb,))
    print(f"conv1_1 nn.Conv bf16 in : {t_c1*1e3:7.2f} ms/batch", flush=True)
    t_c1f = chain(lambda xx: conv(xx, w1, b1), (x,))
    print(f"conv1_1 nn.Conv f32 in  : {t_c1f*1e3:7.2f} ms/batch", flush=True)

    # w1s[ky, sx, (px,c), (qx,f)]: output col 2j+qx, tap dx reads input
    # col 2(j+sx)+px with qx+dx = 2*sx+px — structured-zero packed kernel
    w1s = np.zeros((3, 3, 6, 128), np.float32)
    w1n = np.asarray(w1, np.float32)
    for ky in range(3):
        for qx in range(2):
            for dx in (-1, 0, 1):
                t = qx + dx
                px = t % 2
                sx = (t - px) // 2
                w1s[ky, sx + 1, px * 3:(px + 1) * 3,
                    qx * 64:(qx + 1) * 64] = w1n[ky, dx + 1]
    w1s = jnp.asarray(w1s)

    def conv11_s2dx(xx, w1s_, b1_):
        # pack W pairs: [B,H,W/2,6] -> conv [3,3,6,128] -> unpack
        bb, hh, ww, _ = xx.shape
        xs = xx.reshape(bb, hh, ww // 2, 6)
        dn = jax.lax.conv_dimension_numbers(xs.shape, w1s_.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            xs.astype(jnp.bfloat16), w1s_.astype(jnp.bfloat16), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=dn)
        y = jax.nn.relu(y + jnp.tile(b1_.astype(jnp.bfloat16), 2))
        return y.reshape(bb, hh, ww, 64)

    ys = np.asarray(jax.jit(conv11_s2dx)(xb, w1s, b1)[:1, 5:8, 5:12],
                    np.float32)
    yr = np.asarray(y1[:1, 5:8, 5:12], np.float32)
    errs = np.abs(ys - yr).max() / (np.abs(yr).max() + 1e-6)
    print(f"conv1_1 s2d-x rel err   : {errs:.2e}", flush=True)
    t_s2d = chain(lambda xx: conv11_s2dx(xx, w1s, b1), (xb,))
    print(f"conv1_1 s2d-x           : {t_s2d*1e3:7.2f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
