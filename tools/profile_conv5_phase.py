"""Probe: dilated conv5 block vs exact phase re-association (round 4).

The VGG16-OICR conv5 block (vgg16.py:66-74 in the reference) is three
3x3 convs with dilation 2 / padding 2 at stride-8 resolution. Under
dilation 2 the 4 spatial phases (i%2, j%2) never mix, so the whole block
is EXACTLY a dense 3x3/pad-1 conv stack over the 4 subsampled grids:

    s2d: [B,H,W,C] -> [B*4, H/2, W/2, C]   (phase-major batch)
    3x dense conv3x3 pad1
    inverse s2d back to [B,H,W,C]

Same sums, same dtype -> identical results up to conv-tiling ulps.
This probe measures whether XLA's dilated conv leaves MXU rate on the
table vs the dense-phase form (it did for the stem: NOTES.md s2d).

Caveats before promoting this transform into ops/ (ADVICE r4):
- the re-association is exact only for EVEN H and W (the phase split
  assumes 2|H, 2|W) — a shipped version must guard on parity;
- the probe applies ReLU after the third conv for simplicity, but the
  reference strips conv5_3's trailing ReLU (make_layers returns
  layers[:-1]) — immaterial for throughput, wrong as a parity template.

    python -u tools/profile_conv5_phase.py
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

    b, h, w, c = 8, 104, 168, 512
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.bfloat16)
    ks = [jnp.asarray(rng.randn(3, 3, c, c) * 0.03, jnp.bfloat16)
          for _ in range(3)]

    def conv(xx, k, d):
        out = jax.lax.conv_general_dilated(
            xx, k, (1, 1), [(d, d), (d, d)], rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.maximum(out, 0)

    def block_dilated(xx, k1, k2, k3):
        return conv(conv(conv(xx, k1, 2), k2, 2), k3, 2)

    def s2d(xx):
        bb, hh, ww, cc = xx.shape
        assert hh % 2 == 0 and ww % 2 == 0, "phase split needs even H, W"
        # phase-major batch: [ph*2+pw, B, H/2, W/2, C] -> merge to batch
        y = xx.reshape(bb, hh // 2, 2, ww // 2, 2, cc)
        y = y.transpose(2, 4, 0, 1, 3, 5)
        return y.reshape(4 * bb, hh // 2, ww // 2, cc)

    def inv_s2d(yy, bb):
        _, hh, ww, cc = yy.shape
        y = yy.reshape(2, 2, bb, hh, ww, cc).transpose(2, 3, 0, 4, 1, 5)
        return y.reshape(bb, hh * 2, ww * 2, cc)

    def block_phase(xx, k1, k2, k3):
        y = s2d(xx)
        y = conv(conv(conv(y, k1, 1), k2, 1), k3, 1)
        return inv_s2d(y, xx.shape[0])

    # exactness
    ref = np.asarray(block_dilated(x, *ks), np.float32)
    got = np.asarray(block_phase(x, *ks), np.float32)
    scale = np.abs(ref).max()
    err = np.abs(ref - got).max() / scale
    print(f"max rel err phase vs dilated: {err:.3e}")

    gflop = 3 * 2 * 9 * c * c * h * w * b / 1e9
    t_d = chain_time(block_dilated, (x, *ks))
    print(f"dilated block : {t_d*1e3:7.2f} ms  {gflop/t_d/1e3:6.1f} TF/s")
    t_p = chain_time(block_phase, (x, *ks))
    print(f"phase block   : {t_p*1e3:7.2f} ms  {gflop/t_p/1e3:6.1f} TF/s"
          f"  ({t_d/t_p:.2f}x)")
    # phase convs without the transposes (upper bound)
    y0 = s2d(x)

    def convs_only(yy, k1, k2, k3):
        return conv(conv(conv(yy, k1, 1), k2, 1), k3, 1)

    t_c = chain_time(convs_only, (y0, *ks))
    print(f"phase convs only (no s2d): {t_c*1e3:7.2f} ms "
          f" {gflop/t_c/1e3:6.1f} TF/s")


if __name__ == "__main__":
    main()
