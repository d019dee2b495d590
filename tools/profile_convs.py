"""Per-layer VGG16-OICR conv timing at the bench shape (chained, bf16).

Prints ms/batch and effective TF/s for every conv layer individually, plus
block subtotals — the map for deciding where backbone optimization effort
goes (round-4: backbone is 58 of the 106 ms eval forward).

    python -u tools/profile_convs.py
"""

import time

import numpy as np


def chain_time(fn, args, iters=8, reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(*a):
        def body(i, acc):
            x = a[0] + (acc * 1e-30).astype(a[0].dtype)
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

    b, h0, w0 = 8, 832, 1344
    rng = np.random.RandomState(0)

    # (name, H, W, Cin, Cout, dilation)
    layers = [
        ("conv1_1", h0, w0, 3, 64, 1),
        ("conv1_2", h0, w0, 64, 64, 1),
        ("conv2_1", h0 // 2, w0 // 2, 64, 128, 1),
        ("conv2_2", h0 // 2, w0 // 2, 128, 128, 1),
        ("conv3_1", h0 // 4, w0 // 4, 128, 256, 1),
        ("conv3_2", h0 // 4, w0 // 4, 256, 256, 1),
        ("conv3_3", h0 // 4, w0 // 4, 256, 256, 1),
        ("conv4_1", h0 // 8, w0 // 8, 256, 512, 1),
        ("conv4_2", h0 // 8, w0 // 8, 512, 512, 1),
        ("conv4_3", h0 // 8, w0 // 8, 512, 512, 1),
        ("conv5_1", h0 // 8, w0 // 8, 512, 512, 2),
        ("conv5_2", h0 // 8, w0 // 8, 512, 512, 2),
        ("conv5_3", h0 // 8, w0 // 8, 512, 512, 2),
    ]

    def conv(x, k, d):
        out = jax.lax.conv_general_dilated(
            x, k, (1, 1), [(d, d), (d, d)], rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.maximum(out, 0)

    total = 0.0
    block_ms = {}
    for name, h, w, cin, cout, d in layers:
        x = jnp.asarray(rng.randn(b, h, w, cin), jnp.bfloat16)
        k = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.bfloat16)
        t = chain_time(lambda xx, kk, d=d: conv(xx, kk, d), (x, k))
        gflop = 2 * 9 * cin * cout * h * w * b / 1e9
        tfs = gflop / t / 1e3
        total += t
        blk = name[:5]
        block_ms[blk] = block_ms.get(blk, 0.0) + t
        print(f"{name}: {t*1e3:7.2f} ms  {gflop:7.1f} GFLOP  {tfs:6.1f} TF/s")
    print("---")
    for blk, t in block_ms.items():
        print(f"{blk}*: {t*1e3:7.2f} ms")
    print(f"TOTAL conv: {total*1e3:.2f} ms/batch")


if __name__ == "__main__":
    main()
