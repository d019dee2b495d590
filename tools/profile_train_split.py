"""Train-step backward attribution (VERDICT r4 task 5 first deliverable).

The full jitted train step (tools/bench_train.py: ~400 ms at batch 8,
704x1152, P=2048) is decomposed with the chained-timing protocol
(NOTES.md: in-graph fori_loop chains, scalar fetch) into:

  fwd_loss        — the loss forward alone (no grad, no update)
  grad_heads      — value_and_grad wrt ONLY the head/neck/sim params
                    (backbone params held constant -> XLA prunes the
                    backbone weight-grads, the pool backward, and the
                    conv input-grad chain)
  grad_all        — value_and_grad wrt every param (no optimizer)
  full_step       — grad_all + optax update + param apply (= the step
                    bench_train times, minus data/host)

Differences attribute the backward:
  grad_all - grad_heads   ~= backbone bwd + pool bwd + conv wgrads
  full_step - grad_all    ~= optimizer update + apply
  grad_heads - fwd_loss   ~= mining/loss bwd + neck/head bwd

    python -u tools/profile_train_split.py [--iters 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from odwscl_tpu.config import get_default_cfg
    from odwscl_tpu.models import WSODDetector, Batch
    from odwscl_tpu.engine.trainer import create_train_state, make_train_step

    b, h, w, p, c = 8, 704, 1152, 2048, 21
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(b, h, w, 3), jnp.float32)
    sizes = jnp.tile(jnp.array([[672.0, 1120.0]]), (b, 1))
    x1y1 = rng.uniform(0, w - 320, (b, p, 2))
    wh = np.exp(rng.uniform(np.log(16), np.log(900), (b, p, 2)))
    boxes = jnp.asarray(np.concatenate(
        [x1y1, np.minimum(x1y1 + wh, [w - 1, h - 1])], -1), jnp.float32)
    mask = jnp.ones((b, p), bool)
    labels = np.zeros((b, c), np.float32)
    for i in range(b):
        labels[i, rng.randint(1, c, 3)] = 1.0
    batch = Batch(images, sizes, boxes, mask, jnp.array(labels))

    cfg = get_default_cfg()
    model = WSODDetector(s2d_stem=True)
    state, tx, _ = create_train_state(model, cfg, batch,
                                      jax.random.PRNGKey(0))
    step = make_train_step(model, tx)
    d_rng = jax.random.PRNGKey(7)
    a_rng = jax.random.PRNGKey(8)

    def loss_of(params, bt):
        losses, _ = model.apply({"params": params}, bt, train=True,
                                rngs={"dropout": d_rng, "augment": a_rng})
        return jnp.sum(jnp.stack(list(losses.values())))

    def chain(fn, *xs, iters=args.iters, reps=2):
        @jax.jit
        def chained(*a):
            def body(i, acc):
                return acc + fn(acc, *a)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        float(chained(*xs))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chained(*xs))
            best = min(best, time.perf_counter() - t0)
        return best / iters

    def perturb(bt, acc):
        return bt.replace(images=bt.images + (acc * 1e-30).astype(
            bt.images.dtype))

    # 1) forward only
    t_fwd = chain(lambda acc, pr, bt: loss_of(pr, perturb(bt, acc)),
                  state.params, batch)
    print(f"fwd_loss   : {t_fwd*1e3:7.1f} ms", flush=True)

    # 2) grads wrt non-backbone params only
    bb_key = "backbone"
    head_params = {k: v for k, v in state.params.items() if k != bb_key}
    bb_params = {bb_key: state.params[bb_key]}

    def loss_heads(hp, bp, bt):
        return loss_of({**hp, **bp}, bt)

    def g_heads(acc, hp, bp, bt):
        l, g = jax.value_and_grad(loss_heads)(hp, bp, perturb(bt, acc))
        flat = jax.tree_util.tree_leaves(g)
        return l + sum(jnp.sum(x.astype(jnp.float32)) for x in flat) * 1e-12

    t_heads = chain(g_heads, head_params, bb_params, batch)
    print(f"grad_heads : {t_heads*1e3:7.1f} ms", flush=True)

    # 3) grads wrt all params
    def g_all(acc, pr, bt):
        l, g = jax.value_and_grad(loss_of)(pr, perturb(bt, acc))
        flat = jax.tree_util.tree_leaves(g)
        return l + sum(jnp.sum(x.astype(jnp.float32)) for x in flat) * 1e-12

    t_all = chain(g_all, state.params, batch)
    print(f"grad_all   : {t_all*1e3:7.1f} ms", flush=True)

    # 4) the full train step (grad + optimizer update + apply). Sum EVERY
    # updated leaf — summing only the first (a frozen conv whose update
    # is set_to_zero) lets XLA dead-code-eliminate the whole backward.
    def f_step(acc, st, bt):
        st2, logs = step(st, perturb(bt, acc))
        s = sum(jnp.sum(x.astype(jnp.float32)) for x in
                jax.tree_util.tree_leaves(st2.params))
        return logs["loss"] + s * 1e-12

    t_step = chain(f_step, state, batch)
    print(f"full_step  : {t_step*1e3:7.1f} ms", flush=True)

    # 5) finer forward segments at the train shape
    from odwscl_tpu.models.vgg16 import VGGBackbone, VGGRoINeck
    bb = VGGBackbone(arch="VGG16-OICR", compute_dtype=jnp.bfloat16,
                     s2d_stem=True, freeze_at=4)
    bb_params = {"params": state.params["backbone"]}
    imgs_bf = images.astype(jnp.bfloat16)

    def bb_fwd(acc, pr, im):
        out = bb.apply(pr, im + (acc * 1e-30).astype(im.dtype))
        return jnp.sum(out.astype(jnp.float32)) * 1e-12

    t_bbf = chain(bb_fwd, bb_params, imgs_bf)
    print(f"bb fwd     : {t_bbf*1e3:7.1f} ms", flush=True)

    def bb_fb(acc, pr, im):
        def f(pr):
            out = bb.apply(pr, im + (acc * 1e-30).astype(im.dtype))
            return jnp.sum(out.astype(jnp.float32))
        l, g = jax.value_and_grad(f)(pr)
        return (l + sum(jnp.sum(x.astype(jnp.float32))
                        for x in jax.tree_util.tree_leaves(g))) * 1e-12

    t_bbfb = chain(bb_fb, bb_params, imgs_bf)
    print(f"bb fwd+bwd : {t_bbfb*1e3:7.1f} ms  (bwd ~{(t_bbfb-t_bbf)*1e3:.1f})",
          flush=True)

    print("\nattribution:")
    print(f"  loss fwd (conv+pool+neck+mining fwd) : {t_fwd*1e3:7.1f} ms")
    print(f"  + neck/head/mining bwd               : {(t_heads-t_fwd)*1e3:7.1f} ms")
    print(f"  + backbone bwd + pool bwd            : {(t_all-t_heads)*1e3:7.1f} ms")
    print(f"  + optimizer update                   : {(t_step-t_all)*1e3:7.1f} ms")
    print(f"  = full step                          : {t_step*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
