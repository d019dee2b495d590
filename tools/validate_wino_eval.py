"""End-to-end eval-path drift: Winograd serving path vs direct bf16.

Runs the full detector eval forward (backbone -> pool -> neck -> MIST
heads -> decode) twice on identical inputs/params — TPU.WINO_EVAL on vs
off — and reports score/box drift. The per-layer contract is bounded in
tests/test_winograd(_pallas).py; this checks what accumulates through 13
conv layers + heads on the real compute path.

    python -u tools/validate_wino_eval.py
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from odwscl_tpu.models import WSODDetector, Batch

    print(jax.devices(), flush=True)
    b, h, w, p, c = 2, 416, 672, 512, 21
    rng = np.random.RandomState(0)
    images = jnp.array(rng.randn(b, h, w, 3).astype(np.float32) * 40.0)
    sizes = jnp.tile(jnp.array([[400.0, 666.0]]), (b, 1))
    x1y1 = rng.uniform(0, 500, (b, p, 2))
    wh = rng.uniform(16, 160, (b, p, 2))
    boxes = jnp.array(np.concatenate(
        [x1y1, np.minimum(x1y1 + wh, [665, 399])], -1).astype(np.float32))
    mask = jnp.ones((b, p), bool)
    batch = Batch(images, sizes, boxes, mask, jnp.zeros((b, c), jnp.float32))

    base = WSODDetector()
    variables = jax.jit(base.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "augment": jax.random.PRNGKey(2)}, batch, train=True)

    outs = {}
    for wino in (False, True):
        model = WSODDetector(wino_eval=wino)
        scores, bxs = jax.jit(model.apply, static_argnames=("train",))(
            variables, batch, train=False)
        outs[wino] = (np.asarray(scores, np.float32),
                      np.asarray(bxs, np.float32))
        print(f"wino={wino}: scores mean {outs[wino][0].mean():.6f}",
              flush=True)

    ds = np.abs(outs[True][0] - outs[False][0])
    db = np.abs(outs[True][1] - outs[False][1])
    smax = np.abs(outs[False][0]).max()
    print(f"score drift: max {ds.max():.6f} (rel {ds.max()/smax:.5f}), "
          f"mean {ds.mean():.7f}", flush=True)
    print(f"box drift:   max {db.max():.4f} px, mean {db.mean():.5f} px",
          flush=True)
    # ranking stability: top-1 class per roi
    t1a = outs[False][0].argmax(-1)
    t1b = outs[True][0].argmax(-1)
    flips = (t1a != t1b).mean()
    print(f"top-1 class flips: {flips*100:.3f}% of rois", flush=True)


if __name__ == "__main__":
    import sys
    sys.path.insert(0, "/root/repo")
    main()
