"""In-graph per-layer backbone costs via prefix timing.

Times the REAL production conv chain (same nn.Conv-equivalent ops, bf16,
NHWC) truncated after each layer; successive differences are the honest
in-graph per-layer costs with XLA's actual layout assignments — isolated
per-layer benches (tools/profile_convs.py) can overstate layers whose
inputs would get a different layout mid-graph.

    python -u tools/profile_backbone_prefix.py
"""

import time

import numpy as np

SPEC = [  # (tag, kind, ch, dilation)
    ("conv1_1", "c", 64, 1), ("conv1_2", "c", 64, 1), ("pool1", "M", 0, 0),
    ("conv2_1", "c", 128, 1), ("conv2_2", "c", 128, 1), ("pool2", "M", 0, 0),
    ("conv3_1", "c", 256, 1), ("conv3_2", "c", 256, 1),
    ("conv3_3", "c", 256, 1), ("pool3", "M", 0, 0),
    ("conv4_1", "c", 512, 1), ("conv4_2", "c", 512, 1),
    ("conv4_3", "c", 512, 1),
    ("conv5_1", "c", 512, 2), ("conv5_2", "c", 512, 2),
    ("conv5_3", "c", 512, 2),
]


def main():
    import jax
    import jax.numpy as jnp

    b, h0, w0 = 8, 832, 1344
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(b, h0, w0, 3), jnp.bfloat16)

    # build per-layer kernels once
    kernels = []
    cin = 3
    for tag, kind, ch, d in SPEC:
        if kind == "c":
            kernels.append(jnp.asarray(
                rng.randn(3, 3, cin, ch) * 0.05, jnp.bfloat16))
            cin = ch
        else:
            kernels.append(None)

    def prefix_fn(n):
        def fn(x, ks):
            nconv = 0
            for i, (tag, kind, ch, d) in enumerate(SPEC[:n]):
                if kind == "M":
                    x = jax.lax.reduce_window(
                        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                        (1, 2, 2, 1), "VALID")
                else:
                    x = jax.lax.conv_general_dilated(
                        x, ks[i], (1, 1), [(d, d), (d, d)],
                        rhs_dilation=(d, d),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    nconv += 1
                    if nconv < 13:
                        x = jnp.maximum(x, 0)
            return x
        return fn

    def chain_time(fn, iters=8, reps=3):
        @jax.jit
        def chained(x, ks):
            def body(i, acc):
                out = fn(x + (acc * 1e-30).astype(x.dtype), ks)
                return acc + out.astype(jnp.float32).sum() * 1e-12
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        float(chained(img, kernels))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chained(img, kernels))
            best = min(best, time.perf_counter() - t0)
        return best / iters

    prev = 0.0
    for n in range(1, len(SPEC) + 1):
        t = chain_time(prefix_fn(n))
        tag = SPEC[n - 1][0]
        print(f"after {tag:8s}: {t*1e3:7.2f} ms  (+{(t-prev)*1e3:6.2f} ms)",
              flush=True)
        prev = t


if __name__ == "__main__":
    main()
