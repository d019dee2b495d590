"""Feasibility micro-bench: int8 convs on the v5e MXU vs bf16.

The conv stack is 58 ms of the 112 ms eval forward and conv3-5 already run
at the bf16 hardware peak — only the int8 2x rate can cut them further.
This measures lax.conv_general_dilated with int8 operands
(preferred_element_type=int32) at the real VGG16 layer shapes, plus the
dilation-2 conv5 case.

    python -u tools/bench_int8_conv.py
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


def main():
    import jax
    import jax.numpy as jnp

    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))
    cases = [
        # (tag, B, H, W, Cin, Cout, dilation) — smallest first: int8 conv
        # compiles can hang at large shapes; learn feasibility cheaply
        ("conv4_2 512->512 @104x168", 8, 104, 168, 512, 512, 1),
        ("conv5_2 512->512 d2 @104x168", 8, 104, 168, 512, 512, 2),
        ("conv3_2 256->256 @208x336", 8, 208, 336, 256, 256, 1),
        ("conv2_2 128->128 @416x672", 8, 416, 672, 128, 128, 1),
        ("conv1_2  64->64 @832x1344", 8, 832, 1344, 64, 64, 1),
    ]
    rng = np.random.RandomState(0)
    for tag, b, h, w, ci, co, d in cases:
        x8 = jnp.asarray(rng.randint(-127, 127, (b, h, w, ci)), jnp.int8)
        k8 = jnp.asarray(rng.randint(-127, 127, (3, 3, ci, co)), jnp.int8)
        xb = jnp.asarray(rng.randn(b, h, w, ci), jnp.bfloat16)
        kb = jnp.asarray(rng.randn(3, 3, ci, co), jnp.bfloat16)
        dnn = jax.lax.conv_dimension_numbers(x8.shape, k8.shape,
                                             ("NHWC", "HWIO", "NHWC"))

        def conv_i8(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), [(d, d), (d, d)], rhs_dilation=(d, d),
                dimension_numbers=dnn, preferred_element_type=jnp.int32)

        def conv_bf(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), [(d, d), (d, d)], rhs_dilation=(d, d),
                dimension_numbers=dnn, preferred_element_type=jnp.float32)

        flops = 2 * 9 * ci * co * b * h * w
        tb = chain(conv_bf, (xb, kb))
        print(f"{tag:30s} bf16 {tb*1e3:7.2f} ms ({flops/tb/1e12:6.1f} TF/s)",
              flush=True)
        try:
            t8 = chain(conv_i8, (x8, k8))
            r8 = f"{t8*1e3:7.2f} ms ({flops/t8/1e12:6.1f} TOP/s)"
        except Exception as e:  # pragma: no cover
            r8 = f"FAILED: {type(e).__name__}: {str(e)[:80]}"
        print(f"{tag:30s} int8 {r8}", flush=True)


if __name__ == "__main__":
    main()
