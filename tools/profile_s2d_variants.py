"""Measure s2d stem building-block variants on TPU to pick the fast form.

    PYTHONPATH=/root/repo:/root/.axon_site python -u tools/profile_s2d_variants.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    b, h, w = 8, 832, 1344
    h2, w2 = h // 2, w // 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, 3), jnp.bfloat16)
    xs2d = jnp.asarray(rng.randn(b, h2, w2, 12), jnp.bfloat16)
    y1 = jnp.asarray(rng.randn(b, h2, w2, 256), jnp.bfloat16)
    y64 = jnp.asarray(rng.randn(b, h, w, 64), jnp.bfloat16)
    k_s2d = jnp.asarray(rng.randn(3, 3, 12, 256) * 0.1, jnp.bfloat16)
    k44 = jnp.asarray(rng.randn(4, 4, 3, 256) * 0.1, jnp.bfloat16)
    k44_64 = jnp.asarray(rng.randn(4, 4, 64, 256) * 0.05, jnp.bfloat16)
    k_ph = jnp.asarray(rng.randn(2, 2, 256, 256) * 0.05, jnp.bfloat16)

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

    def s2d_xform(x):
        xs = x.reshape(b, h2, 2, w2, 2, 3).transpose(0, 1, 3, 2, 4, 5)
        return xs.reshape(b, h2, w2, 12)

    def conv_s2d_native(xs):
        return jax.lax.conv_general_dilated(
            xs, k_s2d, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def conv44_stride2(x):
        # phase-batched conv1_1: output [B,h2,w2,256], no input transpose
        xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
        return jax.lax.conv_general_dilated(
            xp, k44, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def conv44_stride2_64(y):
        # phase-batched conv1_2 from FULL-RES 64ch input (fuses pool phases)
        yp = jnp.pad(y, ((0, 0), (1, 2), (1, 2), (0, 0)))
        z = jax.lax.conv_general_dilated(
            yp, k44_64, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        o = None
        for g in range(4):
            gg = z[..., g * 64:(g + 1) * 64]
            o = gg if o is None else jnp.maximum(o, gg)
        return o

    def phase_conv2(y1):
        y1p = jnp.pad(y1, ((0, 0), (1, 1), (1, 1), (0, 0)))
        z = jax.lax.conv_general_dilated(
            y1p, k_ph, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = None
        for p in range(2):
            for q in range(2):
                g = z[:, p:p + h2, q:q + w2, (p * 2 + q) * 64:(p * 2 + q + 1) * 64]
                out = g if out is None else jnp.maximum(out, g)
        return out

    def phase_conv2_even(y1):
        # pad so conv output spatial dims stay even (h2+2 x w2+2 windows of
        # 2x2 -> h2+1; slice AFTER instead keeps z even-sized)
        y1p = jnp.pad(y1, ((0, 0), (1, 3), (1, 3), (0, 0)))
        z = jax.lax.conv_general_dilated(
            y1p, k_ph, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = None
        for p in range(2):
            for q in range(2):
                g = z[:, p:p + h2, q:q + w2, (p * 2 + q) * 64:(p * 2 + q + 1) * 64]
                out = g if out is None else jnp.maximum(out, g)
        return out

    def phase_conv2_taps(y1):
        # explicit 2x2 taps as 4 shifted K=256 matmuls summed (f32 acc)
        y1p = jnp.pad(y1, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for ur in range(2):
            for vr in range(2):
                view = y1p[:, ur:ur + h2 + 1, vr:vr + w2 + 1, :]
                t = jax.lax.dot_general(
                    view, k_ph[ur, vr], (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = t if acc is None else acc + t
        z = acc.astype(jnp.bfloat16)
        out = None
        for p in range(2):
            for q in range(2):
                g = z[:, p:p + h2, q:q + w2, (p * 2 + q) * 64:(p * 2 + q + 1) * 64]
                out = g if out is None else jnp.maximum(out, g)
        return out

    for name, fn, args in [
        ("s2d transform alone", s2d_xform, (x,)),
        ("conv1_1 s2d native [3,3,12,256]", conv_s2d_native, (xs2d,)),
        ("conv1_1 as 4x4/s2 [4,4,3,256]", conv44_stride2, (x,)),
        ("conv1_2+pool as 4x4/s2 from full-res", conv44_stride2_64, (y64,)),
        ("phase conv2 [2,2,256,256] (orig)", phase_conv2, (y1,)),
        ("phase conv2 even-padded", phase_conv2_even, (y1,)),
        ("phase conv2 as 4 tap matmuls", phase_conv2_taps, (y1,)),
    ]:
        try:
            t = chain(fn, args)
            print(f"{name:42s}: {t:7.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:42s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
