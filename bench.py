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
import os

import time

import numpy as np

A100_SINGLE_FWD_IMGS_PER_S = 135.0


def main():
    import jax
    import jax.numpy as jnp
    from odwscl_tpu.models import WSODDetector, Batch

    b, hw_h, hw_w, p, c = 8, 832, 1344, 2048, 21
    b = int(os.environ.get("ODWSCL_BENCH_BATCH", b))
    int8 = os.environ.get("ODWSCL_BENCH_INT8", "") == "1"
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

    # Headline mode = the shipped serving configuration: bf16 direct convs
    # (measured at the chip's effective conv peak, ~120 TF/s — XLA's conv
    # is already MXU-bound, and both Winograd and int8 reformulations
    # measured SLOWER end-to-end, see NOTES.md round-3) + int8 fc6/fc7
    # (the one eval GEMM the int8 MXU rate genuinely accelerates:
    # 20.7 -> 14.9 ms measured; drift bounded by tests/test_int8_eval.py).
    # Opt-outs/variants: ODWSCL_BENCH_BF16=1 pure-bf16 reference-parity
    # path, ODWSCL_BENCH_INT8=1 full int8 incl. convs (slower, kept for
    # measurement), ODWSCL_BENCH_WINO=1 fused Winograd convs (slower).
    wino = os.environ.get("ODWSCL_BENCH_WINO", "0") == "1"
    pure_bf16 = os.environ.get("ODWSCL_BENCH_BF16", "0") == "1"
    model = WSODDetector(int8_eval=int8 or not pure_bf16,
                         int8_eval_convs=int8,
                         int8_static=int8, wino_eval=wino)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "augment": jax.random.PRNGKey(2)}, batch, train=True)
    if int8:
        # one calibration forward records activation scales (bf16 compute)
        _, quant = jax.jit(
            model.apply, static_argnames=("train", "calibrate", "mutable"))(
            variables, batch, train=False, calibrate=True,
            mutable=("quant",))
        variables = {**variables, **quant}

    # timing protocol: ITERS forwards chained inside ONE jit, fetched as a
    # fused scalar. Per-dispatch tunnel latency on this platform is ~36 ms
    # and block_until_ready on large outputs does not reliably fence —
    # chaining measures pure device throughput, which is what a pipelined
    # serving loop (dispatch-ahead) achieves in practice.
    iters = 10

    @jax.jit
    def fwd_chain(v, bt):
        def body(i, acc):
            # the carry feeds the input so XLA cannot hoist the
            # loop-invariant forward out of the loop
            bt2 = bt.replace(images=bt.images + (acc * 1e-30).astype(
                bt.images.dtype))
            scores, boxes = model.apply(v, bt2, train=False)
            return acc + jnp.sum(scores) + jnp.sum(boxes) * 1e-9
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(fwd_chain(variables, batch))  # compile + warmup
    t0 = time.perf_counter()
    s = float(fwd_chain(variables, batch))
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
