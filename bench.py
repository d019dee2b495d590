"""Headline benchmark: eval-forward images/sec/chip on VOC-shaped inputs.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Protocol: the reference's eval hot loop is the model forward (backbone ->
ROIPool -> fc6/fc7 -> MIST heads) repeated 14x/image for TTA
(configs voc07_contra_db_b8_lr0.01_mcg.yaml TEST.BBOX_AUG); throughput is
therefore measured per single forward on the shipped eval shape
(shortest side 800, max 1333 -> padded 832x1344) with a 2048-proposal
bucket, batch 8, bf16.

vs_baseline: the reference repo publishes no numbers (BASELINE.md). We use
an analytic A100 estimate for the same forward: ~740 GFLOPs/image (VGG16
convs at 0.66 MP + 2048 rois x ~240 MFLOP fc6/fc7) at ~35% of 312 TFLOP/s
bf16 peak => ~135 img/s/GPU single-forward. vs_baseline = value / 135.
"""

import json

import time

import numpy as np

A100_SINGLE_FWD_IMGS_PER_S = 135.0


def main():
    import jax
    import jax.numpy as jnp
    from odwscl_tpu.models import WSODDetector, Batch

    b, hw_h, hw_w, p, c = 8, 832, 1344, 2048, 21
    rng = np.random.RandomState(0)
    images = jnp.array(rng.randn(b, hw_h, hw_w, 3).astype(np.float32))
    sizes = jnp.tile(jnp.array([[800.0, 1333.0]]), (b, 1))
    x1y1 = rng.uniform(0, 1000, (b, p, 2))
    wh = rng.uniform(16, 300, (b, p, 2))
    boxes = jnp.array(np.concatenate(
        [x1y1, np.minimum(x1y1 + wh, [1332, 799])], -1).astype(np.float32))
    mask = jnp.ones((b, p), bool)
    batch = Batch(images, sizes, boxes, mask,
                  jnp.zeros((b, c), jnp.float32))

    model = WSODDetector()
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "augment": jax.random.PRNGKey(2)}, batch, train=True)

    # scalar-reduced output: on the axon platform block_until_ready on large
    # outputs does not reliably fence, and device->host transfers are slow;
    # fetching a fused scalar gives honest step timing.
    @jax.jit
    def fwd(v, bt):
        scores, boxes = model.apply(v, bt, train=False)
        return jnp.sum(scores) + jnp.sum(boxes)

    float(fwd(variables, batch))  # compile + warmup

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        s = float(fwd(variables, batch))
    dt = time.perf_counter() - t0

    n_chips = max(jax.local_device_count(), 1)
    imgs_per_s_chip = (b * iters / dt) / n_chips
    print(json.dumps({
        "metric": "voc_eval_forward_images_per_sec_per_chip",
        "value": round(imgs_per_s_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_s_chip / A100_SINGLE_FWD_IMGS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
