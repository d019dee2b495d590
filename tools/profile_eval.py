"""Per-segment eval profiling on the attached TPU chip.

Times backbone / RoI pool / neck+heads separately on the bench shape
(832x1344, P=2048, bf16) to direct optimization work. Run on TPU:
    python tools/profile_eval.py [--train-shape]
"""

import argparse
import time

import numpy as np


def timeit(fn, *args, n=5, warmup=2):
    import jax.numpy as jnp
    for _ in range(warmup):
        r = fn(*args)
        float(jnp.sum(r[0] if isinstance(r, (tuple, list)) else r))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
        float(jnp.sum(r[0] if isinstance(r, (tuple, list)) else r))
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-shape", action="store_true")
    ap.add_argument("--p", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax.core import freeze
    from odwscl_tpu.models.vgg16 import VGGBackbone, VGGRoINeck
    from odwscl_tpu.models.predictors import PREDICTORS
    from odwscl_tpu.ops.roi_pool import roi_pool
    from odwscl_tpu.ops import roi_pool_pallas as rp

    if args.train_shape:
        b, h, w = 8, 704, 1152
    else:
        b, h, w = 8, 832, 1344
    p, c = args.p, 21
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(b, h, w, 3), jnp.bfloat16)
    x1y1 = rng.uniform(0, w - 350, (b, p, 2))
    wh = rng.uniform(16, 300, (b, p, 2))
    boxes = jnp.asarray(np.concatenate(
        [x1y1, np.minimum(x1y1 + wh, [w - 1, h - 1])], -1), jnp.float32)
    mask = jnp.ones((b, p), bool)

    backbone = VGGBackbone(arch="VGG16-OICR", compute_dtype=jnp.bfloat16)
    neck = VGGRoINeck(hidden_dim=4096, compute_dtype=jnp.bfloat16)
    pred = PREDICTORS["MISTPredictor"](num_classes=c, num_refs=3,
                                       compute_dtype=jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    bb_params = jax.jit(backbone.init)(key, images)
    bb_apply = jax.jit(lambda pr, x: backbone.apply(pr, x))
    feats = bb_apply(bb_params, images)
    print("feat shape:", feats.shape, feats.dtype)
    t = timeit(bb_apply, bb_params, images)
    fh, fw, fc = feats.shape[1:]
    print(f"backbone: {t*1e3:.1f} ms/batch")

    # matmul peak reference
    a = jnp.asarray(rng.randn(8192, 8192), jnp.bfloat16)
    bm = jnp.asarray(rng.randn(8192, 8192), jnp.bfloat16)
    mm = jax.jit(lambda x, y: x @ y)
    tm = timeit(mm, a, bm)
    print(f"matmul 8k^3: {tm*1e3:.2f} ms -> {2*8192**3/tm/1e12:.0f} TF/s")

    # pools
    xla_pool = jax.jit(lambda f, bx, m: roi_pool(f, bx, m, 0.125, 7, 32))
    t = timeit(xla_pool, feats, boxes, mask)
    print(f"pool XLA win32: {t*1e3:.1f} ms/batch")
    if rp.pallas_pool_feasible(fh, fw, fc):
        pal = jax.jit(lambda f, bx, m: rp.roi_pool_tpu(f, bx, m, 0.125))
        t = timeit(pal, feats, boxes, mask)
        print(f"pool pallas v1: {t*1e3:.1f} ms/batch")

    pooled = xla_pool(feats, boxes, mask)
    flat = pooled.reshape(b * p, 7, 7, fc)
    nk_params = jax.jit(neck.init, static_argnames="train")(key, flat,
                                                            train=False)
    nk_apply = jax.jit(lambda pr, x: neck.apply(pr, x, train=False))
    roi_feats = nk_apply(nk_params, flat)
    t = timeit(nk_apply, nk_params, flat)
    gf = b * p * (7 * 7 * fc * 4096 + 4096 * 4096) * 2 / 1e12
    print(f"neck fc6/fc7: {t*1e3:.1f} ms/batch ({gf/t:.0f} TF/s)")

    pd_params = jax.jit(pred.init, static_argnames="train")(
        key, roi_feats.reshape(b, p, -1), mask, train=False)
    pd_apply = jax.jit(lambda pr, x, m: pred.apply(pr, x, m, train=False))
    t = timeit(pd_apply, pd_params, roi_feats.reshape(b, p, -1), mask)
    print(f"predictor: {t*1e3:.1f} ms/batch")

    # backbone per-block: time truncated stacks
    from flax import linen as nn

    class Trunc(nn.Module):
        n: int
        @nn.compact
        def __call__(self, x):
            cfgs = [(64, 2, 1), (128, 2, 1), (256, 3, 1), (512, 3, 1),
                    (512, 3, 2)]
            pool_after = [True, True, True, False, False]
            cnt = 0
            for bi, (ch, reps, dil) in enumerate(cfgs):
                for r in range(reps):
                    if cnt >= self.n:
                        return x
                    x = nn.Conv(ch, (3, 3), kernel_dilation=(dil, dil),
                                padding=[(dil, dil), (dil, dil)],
                                dtype=jnp.bfloat16)(x)
                    x = nn.relu(x)
                    cnt += 1
                if pool_after[bi] and cnt < self.n:
                    x = nn.max_pool(x, (2, 2), (2, 2))
            return x

    prev = 0.0
    for nconv in (1, 2, 4, 7, 10, 13):
        m = Trunc(n=nconv)
        pr = jax.jit(m.init)(key, images)
        ap_ = jax.jit(lambda pr, x, m=m: m.apply(pr, x))
        t = timeit(ap_, pr, images)
        print(f"convs[:{nconv:2d}]: {t*1e3:6.1f} ms (+{(t-prev)*1e3:5.1f})")
        prev = t


if __name__ == "__main__":
    main()
