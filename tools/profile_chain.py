"""Chained per-segment eval profiling (honest device timing).

Each segment is timed by chaining ITERS applications inside ONE jit via
lax.fori_loop with the carry perturbing the input (dispatches through the
axon tunnel cost ~36 ms that pipelining does not hide — see NOTES.md).

    python -u tools/profile_chain.py [--train-shape] [--iters 10]
"""

import argparse
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time

import numpy as np


def chain_time(apply_fn, perturb_fn, args, iters=10, reps=2):
    """apply_fn(*args) -> array; perturb_fn(args, acc) -> args'."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(*a):
        def body(i, acc):
            a2 = perturb_fn(a, acc)
            out = apply_fn(*a2)
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-12
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(chained(*args))  # compile + warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-shape", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--p", type=int, default=2048)
    ap.add_argument("--int8", action="store_true",
                    help="also time the int8 serving variants per segment")
    ap.add_argument("--layers", action="store_true",
                    help="also time truncated conv stacks per layer")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from odwscl_tpu.models.vgg16 import VGGBackbone, VGGRoINeck
    from odwscl_tpu.models.predictors import PREDICTORS
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
    key = jax.random.PRNGKey(0)

    def perturb_img(a, acc):
        return (a[0] + (acc * 1e-30).astype(a[0].dtype),) + a[1:]

    # matmul peak reference
    a8 = jnp.asarray(rng.randn(8192, 8192), jnp.bfloat16)
    b8 = jnp.asarray(rng.randn(8192, 8192), jnp.bfloat16)
    t = chain_time(lambda x, y: x @ y, perturb_img, (a8, b8), args.iters)
    print(f"matmul 8k^3 : {t*1e3:7.2f} ms  ({2*8192**3/t/1e12:.0f} TF/s)")

    backbone = VGGBackbone(arch="VGG16-OICR", compute_dtype=jnp.bfloat16,
                       s2d_stem=True)  # shipped TPU.S2D_STEM default
    bb_params = jax.jit(backbone.init)(key, images)
    t = chain_time(lambda pr, x: backbone.apply(pr, x),
                   lambda a, acc: (a[0], a[1] + (acc * 1e-30).astype(a[1].dtype)),
                   (bb_params, images), args.iters)
    feats = jax.jit(backbone.apply)(bb_params, images)
    if args.int8:
        bb8 = VGGBackbone(arch="VGG16-OICR", compute_dtype=jnp.bfloat16,
                          int8_eval=True, int8_static=True,
                          s2d_stem=True)
        _, quant = jax.jit(lambda pr, x: bb8.apply(
            pr, x, fast_eval=True, calibrate=True,
            mutable=["quant"]))(bb_params, images)
        v8 = {**bb_params, **quant}
        t8 = chain_time(lambda pr, x: bb8.apply(pr, x, fast_eval=True),
                        lambda a, acc: (a[0], a[1] + (acc * 1e-30).astype(
                            a[1].dtype)), (v8, images), args.iters)
    fh, fw, fc = feats.shape[1:]
    # conv flops at this shape
    px = h * w
    fl = px*9*2*(3*64 + 64*64) + (px//4)*9*2*(64*128 + 128*128) \
        + (px//16)*9*2*(128*256 + 2*256*256) \
        + (px//64)*9*2*(256*512 + 2*512*512 + 3*512*512)
    print(f"backbone    : {t*1e3:7.2f} ms  ({b*fl/t/1e12:.0f} TF/s eff, "
          f"{b*fl/1e12:.2f} TF/batch)")
    if args.int8:
        print(f"backbone i8 : {t8*1e3:7.2f} ms  ({b*fl/t8/1e12:.0f} TOP/s eff)")

    if rp.pallas_pool_feasible(fh, fw, fc):
        t = chain_time(
            lambda f, bx, m: rp.roi_pool_tpu(f, bx, m, 0.125),
            perturb_img, (feats, boxes, mask), args.iters)
        print(f"pool pallas : {t*1e3:7.2f} ms")

    pooled = jax.jit(
        lambda f, bx, m: rp.roi_pool_tpu(f, bx, m, 0.125))(feats, boxes, mask)
    flat = pooled.reshape(b * p, 7 * 7 * fc)
    neck = VGGRoINeck(hidden_dim=4096, compute_dtype=jnp.bfloat16)
    nk_params = jax.jit(neck.init, static_argnames="train")(key, flat,
                                                            train=False)
    t = chain_time(lambda pr, x: neck.apply(pr, x, train=False),
                   lambda a, acc: (a[0], a[1] + (acc * 1e-30).astype(
                       a[1].dtype)), (nk_params, flat), args.iters)
    gf = b * p * (7 * 7 * fc * 4096 + 4096 * 4096) * 2 / 1e12
    print(f"neck fc6/fc7: {t*1e3:7.2f} ms  ({gf/t:.0f} TF/s)")
    if args.int8:
        neck8 = VGGRoINeck(hidden_dim=4096, compute_dtype=jnp.bfloat16,
                           int8_eval=True)
        t8 = chain_time(lambda pr, x: neck8.apply(pr, x, train=False),
                        lambda a, acc: (a[0], a[1] + (acc * 1e-30).astype(
                            a[1].dtype)), (nk_params, flat), args.iters)
        print(f"neck int8   : {t8*1e3:7.2f} ms  ({gf/t8:.0f} TOP/s)")

    roi_feats = jax.jit(
        lambda pr, x: neck.apply(pr, x, train=False))(nk_params, flat)
    pred = PREDICTORS["MISTPredictor"](num_classes=c, num_refs=3,
                                       compute_dtype=jnp.bfloat16)
    rf = roi_feats.reshape(b, p, -1)
    pd_params = jax.jit(pred.init, static_argnames="train")(key, rf, mask,
                                                            train=False)
    def pred_apply(pr, x, m):
        out = pred.apply(pr, x, m, train=False)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
    t = chain_time(pred_apply,
                   lambda a, acc: (a[0], a[1] + (acc * 1e-30).astype(
                       a[1].dtype), a[2]), (pd_params, rf, mask), args.iters)
    print(f"predictor   : {t*1e3:7.2f} ms")

    if args.layers:
        # truncated conv stacks -> per-layer deltas (all chained)
        class Trunc(nn.Module):
            n: int

            @nn.compact
            def __call__(self, x):
                cfgs = [(64, 2, 1), (128, 2, 1), (256, 3, 1), (512, 3, 1),
                        (512, 3, 2)]
                pool_after = [True, True, True, False, False]
                cnt = 0
                for bi, (ch, reps, dil) in enumerate(cfgs):
                    for _ in range(reps):
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
        for nconv in (1, 2, 3, 4, 7, 10, 13):
            m = Trunc(n=nconv)
            pr = jax.jit(m.init)(key, images)
            t = chain_time(lambda prm, x, m=m: m.apply(prm, x),
                           lambda a, acc: (a[0], a[1] + (acc * 1e-30).astype(
                               a[1].dtype)), (pr, images), args.iters)
            print(f"convs[:{nconv:2d}]  : {t*1e3:7.2f} ms (+{(t-prev)*1e3:6.2f})")
            prev = t


if __name__ == "__main__":
    main()
