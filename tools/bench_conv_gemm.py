"""Experiment: 3x3 conv as 9 shifted-tap GEMM accumulations vs XLA conv.

XLA's int8 MATMUL reaches ~225 TOP/s on this chip (quant.py) while its
int8 CONV only reaches ~126 TOP/s (bench_int8_conv.py) — if the tap-GEMM
formulation inherits matmul rates, the int8 conv stack gets ~2x faster
(and possibly the bf16 one too: matmul peak 126-167 vs conv ~92 TF/s).

    python -u tools/bench_conv_gemm.py
"""

import time

import numpy as np


def chain(fn, args, iters=8, reps=2):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(*a):
        def body(i, acc):
            x = a[0]
            pert = (acc.astype(jnp.float32) * 0).astype(x.dtype)
            out = fn(x + pert[..., None, None, None], *a[1:])
            return acc + out.astype(jnp.float32).sum() * 1e-12
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(chained(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def conv9gemm(x, k, dilation=1, acc_dtype=None):
    """3x3 SAME conv as 9 shifted [B*H*W, Cin] x [Cin, Cout] dots."""
    import jax
    import jax.numpy as jnp
    b, h, w, c = x.shape
    d = dilation
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            xs = xp[:, dy * d:dy * d + h, dx * d:dx * d + w, :]
            xs = xs.reshape(b * h * w, c)
            t = jax.lax.dot_general(xs, k[dy, dx],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=acc_dtype)
            acc = t if acc is None else acc + t
    return acc.reshape(b, h, w, -1)


def main():
    import jax
    import jax.numpy as jnp

    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))
    cases = [
        ("conv4_2 512 @104x168 ", 8, 104, 168, 512, 512, 1),
        ("conv5_2 512 d2       ", 8, 104, 168, 512, 512, 2),
        ("conv3_2 256 @208x336 ", 8, 208, 336, 256, 256, 1),
        ("conv2_2 128 @416x672 ", 8, 416, 672, 128, 128, 1),
        ("conv1_2  64 @832x1344", 8, 832, 1344, 64, 64, 1),
    ]
    rng = np.random.RandomState(0)
    for tag, b, h, w, cin, cout, dil in cases:
        gmac = b * h * w * cin * cout * 9 / 1e9
        for dt, acc_dt, unit in ((jnp.bfloat16, jnp.float32, "TF/s"),
                                 (jnp.int8, jnp.int32, "TOP/s")):
            x = jnp.asarray(rng.randn(b, h, w, cin) * 10, dt)
            k = jnp.asarray(rng.randn(3, 3, cin, cout), dt)

            def xla_conv(xx, kk):
                return jax.lax.conv_general_dilated(
                    xx, kk, (1, 1), [(dil, dil), (dil, dil)],
                    rhs_dilation=(dil, dil), dimension_numbers=dn,
                    preferred_element_type=acc_dt)

            def gemm9(xx, kk):
                return conv9gemm(xx, kk, dil, acc_dt)

            for name, fn in (("conv", xla_conv), ("gemm9", gemm9)):
                try:
                    t = chain(fn, (x, k))
                    print(f"{tag} {dt.__name__:8s} {name:6s} "
                          f"{t*1e3:7.2f} ms ({2*gmac/t/1e3:6.1f} {unit})",
                          flush=True)
                except Exception as e:
                    print(f"{tag} {dt.__name__:8s} {name:6s} FAILED: "
                          f"{type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
