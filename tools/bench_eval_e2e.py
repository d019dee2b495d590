#!/usr/bin/env python
"""END-TO-END eval pipeline benchmark (VERDICT r4 task 1).

The headline bench (bench.py) times the bare jitted forward; the
reference's measured quantity is the WHOLE inference loop — host
preprocessing, 14 TTA forwards/image, un-flip/rescale + AVG merge, device
NMS, host finalize (wetectron/engine/inference.py:99-112 total_time +
bbox_aug.py:11-76). This tool pushes N synthetic-VOC images at a
realistic VOC size through the real `inference()` (predictions cache
OFF) with the shipped 14-transform TTA config and reports:

  - e2e images/sec/chip (wall clock of the prediction loop) — COLD
    (includes per-shape compiles) and STEADY (a second pass over the
    same images with everything compiled; the deployment-relevant rate),
  - the pure-device forward cost of the SAME work: for every TTA
    transform, the jitted eval forward at that transform's collated batch
    shape is timed with the honest chained protocol (bench.py _measure —
    one jit, fori_loop, carry feeds input, batch DEVICE-RESIDENT so the
    chain is not re-uploading images every call), multiplied by the
    number of batches; plus the device finalize (TTA merge + NMS) chain,
  - the host->device transfer cost per batch (the axon tunnel moves
    ~0.1-0.3 GB/s, so image uploads — not device compute — can bound
    this loop; measured explicitly per scale), and
  - pipeline overhead % = steady_wall/device - 1 (bar: <= 15%).

Writes ONE JSON line and (with --out) BENCH_EVAL_E2E.json.

    python -u tools/bench_eval_e2e.py [--n-images 64] [--int8]
        [--out BENCH_EVAL_E2E.json]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def measure_chain(fn, args_tuple, iters=8, reps=2):
    """Chained device timing: fn must return a scalar; one jit wraps
    `iters` dependent evaluations (see bench.py _measure)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(*a):
        def body(i, acc):
            return acc + fn(acc, *a)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(chain(*args_tuple))  # compile + warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chain(*args_tuple))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=64)
    ap.add_argument("--img-h", type=int, default=375)
    ap.add_argument("--img-w", type=int, default=500)
    ap.add_argument("--n-props", type=int, default=2000)
    ap.add_argument("--data-root", default="/tmp/synth_voc_e2e")
    ap.add_argument("--config",
                    default="configs/voc/voc07_contra_db_b8_lr0.01_mcg.yaml")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--device-resize", action="store_true",
                    help="TPU.EVAL_DEVICE_RESIZE serving fast path")
    ap.add_argument("--out", default="")
    ap.add_argument("--regen", action="store_true")
    args = ap.parse_args()

    # --- synthetic VOC at a realistic eval size -------------------------
    marker = os.path.join(args.data_root, f".gen_{args.n_images}_"
                          f"{args.img_h}x{args.img_w}_{args.n_props}")
    if args.regen or not os.path.exists(marker):
        shutil.rmtree(args.data_root, ignore_errors=True)
        from make_synthetic_voc import main as gen
        gen(args.data_root, n_train=2, n_test=args.n_images,
            img_hw=(args.img_h, args.img_w), n_props=args.n_props)
        open(marker, "w").close()

    import jax
    import jax.numpy as jnp
    from odwscl_tpu.config import get_default_cfg
    from odwscl_tpu.models import detector_from_cfg
    from odwscl_tpu.data import make_eval_loaders
    from odwscl_tpu.engine.inference import inference, Inferencer, TTAConfig
    from odwscl_tpu.utils import setup_logger

    cfg = get_default_cfg()
    cfg.merge_from_file(args.config)
    outdir = tempfile.mkdtemp(prefix="bench_e2e_")
    overrides = ["OUTPUT_DIR", outdir, "TEST.IMS_PER_BATCH", "8",
                 "DATASETS.TEST", '("voc_2007_test",)',
                 "PROPOSAL_FILES.TEST", '("proposal/SS-voc07_test.pkl",)']
    if args.int8:
        overrides += ["TPU.INT8_EVAL", "True", "TPU.INT8_EVAL_CONVS", "True",
                      "TPU.INT8_STATIC", "True"]
    if args.device_resize:
        overrides += ["TPU.EVAL_DEVICE_RESIZE", "True"]
    cfg.merge_from_list(overrides)
    cfg.freeze()
    setup_logger("odwscl_tpu", None, 0)

    model = detector_from_cfg(cfg)
    (name, loader), = make_eval_loaders(cfg, args.data_root)

    # init params on a tiny batch (jitted lightweight init)
    from odwscl_tpu.models import Batch
    rng = np.random.RandomState(0)
    tiny = Batch(images=jnp.zeros((1, 96, 128, 3), jnp.float32),
                 image_sizes=jnp.array([[96.0, 128.0]]),
                 boxes=jnp.array(rng.uniform(0, 64, (1, 16, 4)), jnp.float32),
                 box_mask=jnp.ones((1, 16), bool),
                 labels=jnp.zeros((1, cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES),
                                  jnp.float32))
    variables = jax.jit(lambda r, b: model.init(r, b, method="init_all"))(
        {"params": jax.random.PRNGKey(0), "augment": jax.random.PRNGKey(1)},
        tiny)

    # --- 1) the real end-to-end loop ------------------------------------
    # cold pass: includes one compile per TTA shape (amortizes over the
    # dataset in a real eval; separated here so the steady rate is visible)
    timing = {}
    t_all0 = time.time()
    inference(model, variables, cfg, loader, loader.dataset,
              output_folder=None, use_cached=False, timing_out=timing)
    t_all = time.time() - t_all0
    wall_cold = timing["wall_s"]
    n = timing["n_images"]
    # steady pass: everything compiled; this is the deployment rate
    timing2 = {}
    inference(model, variables, cfg, loader, loader.dataset,
              output_folder=None, use_cached=False, timing_out=timing2)
    wall = timing2["wall_s"]
    e2e_ips = n / wall
    e2e_ips_cold = n / wall_cold

    # --- 2) pure-device cost of the same work ---------------------------
    # per-transform forward at the exact collated shape, chained
    inferencer = Inferencer(model, variables, cfg)
    if inferencer._needs_calib:          # int8: calibrate once like the CLI
        inferencer.calibrate(loader, cfg.TPU.INT8_CALIB_BATCHES)
    variables = inferencer.variables
    transforms = TTAConfig(cfg).transforms()
    first_samples = None
    for _, samples, _ in loader:
        first_samples = samples
        break
    n_batches = (n + len(first_samples) - 1) // len(first_samples)
    per_tr = []
    device_fwd_s = 0.0
    transfer_s = 0.0
    seen_shapes = set()
    for tr in transforms:
        host_batch = inferencer.collator([tr(s) for s in first_samples])
        if inferencer._transfer_bf16:
            import ml_dtypes
            host_batch = host_batch.replace(
                images=host_batch.images.astype(ml_dtypes.bfloat16))
        # upload cost for this scale's batch (the real loop pays it once
        # per unflipped scale; flips are derived on device). In
        # device-resize mode the loop uploads only the BASE batch —
        # measured separately below.
        up = 0.0
        if not tr.flip and not cfg.TPU.EVAL_DEVICE_RESIZE:
            t0 = time.perf_counter()
            dev = jax.device_put(host_batch)
            float(jnp.sum(dev.images[0, 0, :, 0].astype(jnp.float32)))
            up = time.perf_counter() - t0
            transfer_s += up * n_batches
        batch = jax.device_put(host_batch)  # device-resident for timing
        float(jnp.sum(batch.images[0, 0, :, 0].astype(jnp.float32)))

        def fwd(acc, v, bt):
            bt2 = bt.replace(images=bt.images + (acc * 1e-30).astype(
                bt.images.dtype))
            scores, boxes = model.apply(v, bt2, train=False)
            return jnp.sum(scores) + jnp.sum(boxes) * 1e-9

        sec = measure_chain(fwd, (variables, batch))
        per_tr.append({"shape": list(batch.images.shape),
                       "flip": tr.flip, "sec_per_batch": round(sec, 4)})
        device_fwd_s += sec * n_batches
        print(f"  transform {batch.images.shape} flip={tr.flip}: "
              f"{sec*1e3:.1f} ms/batch"
              + ("" if not up else f"  (upload {up*1e3:.0f} ms)"),
              flush=True)
    if cfg.TPU.EVAL_DEVICE_RESIZE:
        base, _ = inferencer._prep_base(first_samples)
        host_base = jax.device_get(base)
        t0 = time.perf_counter()
        dev = jax.device_put(host_base)
        float(jnp.sum(dev.images[0, 0, :, 0].astype(jnp.float32)))
        up = time.perf_counter() - t0
        transfer_s = up * n_batches
        print(f"  base batch {tuple(host_base.images.shape)}: upload "
              f"{up*1e3:.0f} ms", flush=True)

    # device finalize (AVG merge output -> NMS -> topk) at identity shape
    from odwscl_tpu.engine.postprocess import finalize_detections_device
    b0 = inferencer.collator([transforms[0](s) for s in first_samples])
    sc, bx = inferencer.forward_batch(b0)
    sc, bx = jnp.asarray(sc), jnp.asarray(bx)
    bsz, p = sc.shape[:2]
    bx4 = bx.reshape(bsz, p, -1, 4)
    msk = jnp.asarray(b0.box_mask)

    def fin(acc, s_, b_, m_):
        out = finalize_detections_device(
            b_ + (acc * 1e-30).astype(b_.dtype), s_, m_,
            inferencer.nms_thresh, inferencer.score_thresh,
            inferencer.det_per_img)
        return sum(jnp.sum(o.astype(jnp.float32)) * 1e-9 for o in out)

    fin_sec = measure_chain(fin, (sc, bx4, msk))
    device_total = device_fwd_s + fin_sec * n_batches
    overhead = wall / device_total - 1.0

    result = {
        "metric": "voc_eval_e2e_images_per_sec_per_chip",
        "value": round(e2e_ips, 2),
        "unit": "images/sec/chip",
        "mode": ("int8-static" if args.int8 else "bf16-parity")
                + ("+device-resize" if cfg.TPU.EVAL_DEVICE_RESIZE else ""),
        "n_images": n,
        "n_transforms": len(transforms),
        "wall_steady_s": round(wall, 2),
        "wall_cold_s": round(wall_cold, 2),
        "cold_images_per_sec": round(e2e_ips_cold, 2),
        "wall_incl_eval_s": round(t_all, 2),
        "device_forward_s": round(device_fwd_s, 2),
        "device_finalize_s": round(fin_sec * n_batches, 2),
        "transfer_s": round(transfer_s, 2),
        "pipeline_overhead_pct": round(overhead * 100, 1),
        "per_transform": per_tr,
        "img_hw": [args.img_h, args.img_w],
        "n_proposals": args.n_props,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    shutil.rmtree(outdir, ignore_errors=True)


if __name__ == "__main__":
    main()
