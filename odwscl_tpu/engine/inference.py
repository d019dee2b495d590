"""Inference engine: per-image detection with optional multi-transform TTA.

Reference: wetectron/engine/inference.py:19-135 (compute_on_dataset, rank
gather, predictions cache, evaluator dispatch) and engine/bbox_aug.py:11-141
(identity + h-flip + per-scale x flip forwards, AVG/UNION merge — valid
because proposals are fixed across transforms, so per-proposal outputs
align). 14 forwards/image in the shipped configs.

TPU notes: each (scale, flip) runs the same jitted eval forward; images pad
to shape buckets so the compile count stays at ~#scales. Scores/boxes are
averaged on host (they're [P, C]-small), then one device NMS pass finishes.
"""

from __future__ import annotations

import logging
import os
import pickle
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.transforms import EvalTransform, Sample
from ..data.collate import BatchCollator
from .postprocess import (per_class_nms_keep, assemble_detections,
                          finalize_detections_device, detections_to_host,
                          resize_detections)

logger = logging.getLogger("odwscl_tpu.inference")


class TTAConfig:
    def __init__(self, cfg):
        self.enabled = cfg.TEST.BBOX_AUG.ENABLED
        self.h_flip = cfg.TEST.BBOX_AUG.H_FLIP
        self.scales = tuple(cfg.TEST.BBOX_AUG.SCALES)
        self.max_size = cfg.TEST.BBOX_AUG.MAX_SIZE
        self.scale_h_flip = cfg.TEST.BBOX_AUG.SCALE_H_FLIP
        self.heur = cfg.TEST.BBOX_AUG.HEUR
        self.base_min = cfg.INPUT.MIN_SIZE_TEST
        self.base_max = cfg.INPUT.MAX_SIZE_TEST
        self.pixel_mean = tuple(cfg.INPUT.PIXEL_MEAN)
        self.pixel_std = tuple(cfg.INPUT.PIXEL_STD)
        self.to_bgr255 = cfg.INPUT.TO_BGR255

    def transforms(self) -> List[EvalTransform]:
        """The (scale, flip) list in reference order (bbox_aug.py:26-51)."""
        out = [EvalTransform(self.base_min, self.base_max, self.pixel_mean,
                             self.pixel_std, self.to_bgr255, flip=False)]
        if self.h_flip:
            out.append(EvalTransform(self.base_min, self.base_max,
                                     self.pixel_mean, self.pixel_std,
                                     self.to_bgr255, flip=True))
        for s in self.scales:
            out.append(EvalTransform(s, self.max_size, self.pixel_mean,
                                     self.pixel_std, self.to_bgr255, flip=False))
            if self.scale_h_flip:
                out.append(EvalTransform(s, self.max_size, self.pixel_mean,
                                         self.pixel_std, self.to_bgr255,
                                         flip=True))
        return out


from functools import partial


@partial(jax.jit, static_argnames=("model",))
def _eval_forward(model, variables, batch):
    """Module-level jitted eval forward, keyed on the (hashable) flax
    module — every Inferencer for the same model shares one trace/
    executable, so fresh Inferencer instances (one per inference() call)
    don't retrace (tools/bench_eval_e2e.py steady-pass cost)."""
    return model.apply(variables, batch, train=False)


@partial(jax.jit,
         static_argnames=("model", "si", "canvas", "has_flip", "first"))
def _fused_scale_step(model, variables, base, in_hw, tgt_all, sums_s,
                      sums_b, *, si, canvas, has_flip, first):
    """One fused dispatch for one TTA scale group of the device-resize
    AVG path: resize -> forward -> device-flip twin -> forward -> unflip
    -> rescale-to-identity -> accumulate. On a high-latency link
    (~36 ms/dispatch through the axon tunnel, NOTES.md) the unfused
    loop's ~8 dispatches per scale dominate the steady eval wall.

    tgt_all [S+1, B, 2]: row si is this scale's per-image (h, w) target,
    row -1 the identity target (one upload per batch — per-scale
    small-array uploads each pay a tunnel round trip)."""
    from ..ops.device_resize import resize_image_batch, scale_boxes_batch

    tgt = tgt_all[si]
    ref_wh = tgt_all[-1][:, ::-1]
    images = resize_image_batch(base.images, in_hw, tgt, canvas)
    bxs = scale_boxes_batch(base.boxes, in_hw, tgt)
    batch = base.replace(images=images, boxes=bxs, image_sizes=tgt)
    outs = [model.apply(variables, batch, train=False) + (False,)]
    if has_flip:
        fb = _flip_batch_device(batch)
        outs.append(model.apply(variables, fb, train=False) + (True,))
    rw = ref_wh[:, 0] / tgt[:, 1]
    rh = ref_wh[:, 1] / tgt[:, 0]
    for s_, b_, flipped in outs:
        if flipped:
            b_ = _unflip_boxes_device(b_, tgt[:, 1])
        b_ = _rescale_boxes_device(b_, rw, rh)
        if first:
            sums_s, sums_b, first = s_, b_, False
        else:
            sums_s = sums_s + s_
            sums_b = sums_b + b_
    return sums_s, sums_b


def _tta_groups(transforms):
    """Group each unflipped scale with its immediately-following flip twin
    (the reference emission order, bbox_aug.py:26-51); the twin is derived
    on device (_flip_batch_device)."""
    groups, i = [], 0
    while i < len(transforms):
        tr = transforms[i]
        nxt = transforms[i + 1] if i + 1 < len(transforms) else None
        if (not tr.flip and nxt is not None and nxt.flip
                and nxt.min_size == tr.min_size
                and nxt.max_size == tr.max_size):
            groups.append((tr, True))
            i += 2
        else:
            groups.append((tr, False))
            i += 1
    return groups


@jax.jit
def _unflip_boxes_device(boxes, widths):
    """boxes [B,P,4K]; widths [B]. BoxList.transpose(0) semantics."""
    b, p, k4 = boxes.shape
    bx = boxes.reshape(b, p, -1, 4)
    w = widths[:, None, None]
    x1 = w - 1.0 - bx[..., 2]
    x2 = w - 1.0 - bx[..., 0]
    return jnp.stack([x1, bx[..., 1], x2, bx[..., 3]], -1).reshape(b, p, k4)


@jax.jit
def _flip_batch_device(batch):
    """Derive a scale's h-flip TTA twin ON DEVICE (VERDICT r4 task 1):
    mirror each padded image's VALID region (width w_i from image_sizes)
    and flip the proposals. Bit-exact vs the host-flip EvalTransform —
    normalization is pixelwise so it commutes with the mirror, and the
    zero padding stays in place (tests/test_eval_pipeline.py)."""
    images, boxes = batch.images, batch.boxes
    b, hh, ww, _ = images.shape
    w = batch.image_sizes[:, 1]                          # (h, w) order
    idx = (w[:, None].astype(jnp.int32) - 1
           - jnp.arange(ww, dtype=jnp.int32)[None, :]) % ww
    flipped = jnp.take_along_axis(images, idx[:, None, :, None], axis=2)
    wf = w[:, None]
    x1 = wf - 1.0 - boxes[..., 2]                        # TO_REMOVE=1
    x2 = wf - 1.0 - boxes[..., 0]
    fboxes = jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], -1)
    # padded slots stay zero (bit-parity with the host-flip collate)
    fboxes = jnp.where(batch.box_mask[..., None], fboxes, boxes)
    return batch.replace(images=flipped, boxes=fboxes)


@jax.jit
def _rescale_boxes_device(boxes, rw, rh):
    b, p, k4 = boxes.shape
    bx = boxes.reshape(b, p, -1, 4)
    rw = rw[:, None, None]
    rh = rh[:, None, None]
    out = jnp.stack([bx[..., 0] * rw, bx[..., 1] * rh,
                     bx[..., 2] * rw, bx[..., 3] * rh], -1)
    return out.reshape(b, p, k4)


def gather_predictions(predictions: Dict[int, dict], dataset_len: int,
                       output_folder: Optional[str],
                       process_count: Optional[int] = None,
                       process_index: Optional[int] = None,
                       timeout_s: float = 600.0):
    """Merge per-process prediction shards (the TPU-native replacement for
    the reference's pickle all_gather, comm.py:52-92 via
    engine/inference.py:50-69).

    Eval images are sharded process_index::process_count
    (data/samplers.py InferenceSampler). Each process writes its shard to
    ``predictions_shard_{i}.pkl``; process 0 polls for all shards, merges
    by global image index, verifies full coverage, and returns the ordered
    list — other processes return None (rank 0 evaluates, matching the
    reference's is_main_process gate, inference.py:114-117).

    Single-process: no files, returns the sorted list directly.
    """
    import jax

    pc = jax.process_count() if process_count is None else process_count
    pi = jax.process_index() if process_index is None else process_index
    if pc <= 1:
        return [predictions[i] for i in sorted(predictions)]
    if not output_folder:
        raise ValueError("multi-process eval needs a shared output_folder "
                         "to gather prediction shards")
    shard = os.path.join(output_folder, f"predictions_shard_{pi}.pkl")
    with open(shard + ".tmp", "wb") as f:
        pickle.dump(predictions, f)
    os.replace(shard + ".tmp", shard)   # atomic: readers never see partials
    if pi != 0:
        return None
    merged = dict(predictions)
    deadline = time.time() + timeout_s
    for other in range(1, pc):
        path = os.path.join(output_folder, f"predictions_shard_{other}.pkl")
        while not os.path.exists(path):
            if time.time() > deadline:
                raise TimeoutError(f"eval shard {other} never appeared at "
                                   f"{path}")
            time.sleep(0.2)
        with open(path, "rb") as f:
            part = pickle.load(f)
        overlap = set(merged) & set(part)
        if overlap:
            raise RuntimeError(f"prediction shards overlap on image ids "
                               f"{sorted(overlap)[:5]}...")
        merged.update(part)
    if len(merged) != dataset_len:
        raise RuntimeError(f"gathered {len(merged)} predictions for a "
                           f"{dataset_len}-image dataset (missing shards?)")
    return [merged[i] for i in sorted(merged)]


def save_int8_scales(path: str, variables: dict):
    """Persist the calibrated "quant" collection as an .npz of
    '/'-joined-path -> scalar (the serving artifact next to the ckpt)."""
    flat = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            kp = f"{prefix}/{k}" if prefix else str(k)
            if isinstance(v, dict):
                walk(v, kp)
            else:
                flat[kp] = np.asarray(v)

    walk(variables["quant"], "")
    np.savez(path, **flat)


def load_int8_scales(path: str) -> dict:
    """Inverse of save_int8_scales: .npz -> {"quant": nested tree}."""
    tree: dict = {}
    with np.load(path) as z:
        for kp in z.files:
            parts = kp.split("/")
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(z[kp])
    return {"quant": tree}


class Inferencer:
    """Runs eval forwards (with TTA) and post-processing for one model."""

    def __init__(self, model, variables, cfg, collator: Optional[BatchCollator] = None):
        self.model = model
        self.variables = variables
        self.tta = TTAConfig(cfg)
        self.nms_thresh = cfg.MODEL.ROI_HEADS.NMS
        self.score_thresh = cfg.MODEL.ROI_HEADS.SCORE_THRESH
        self.det_per_img = cfg.MODEL.ROI_HEADS.DETECTIONS_PER_IMG
        self.collator = collator or BatchCollator(
            cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES,
            cfg.DATALOADER.SIZE_DIVISIBILITY, cfg.TPU.IMAGE_PAD_MULTIPLE,
            tuple(cfg.TPU.PROPOSAL_BUCKETS))
        self._fwd = partial(_eval_forward, self.model)
        # supervised / retinanet stacks (models.build_model families):
        # their eval apply returns a dict; masks run as a second jitted
        # pass on the post-NMS detection boxes (SupervisedRCNN.predict_masks)
        self.mask_on = bool(getattr(model, "mask_on", False))
        self._retinanet = model.__class__.__name__ == "RetinaNetDetector"
        if self._retinanet:
            self.nms_thresh = cfg.MODEL.RETINANET.NMS_TH
            self.score_thresh = cfg.MODEL.RETINANET.INFERENCE_TH
        self._predict_masks = jax.jit(lambda v, b, db, dl: self.model.apply(
            v, b, db, dl, method="predict_masks"))
        self._flip_batch = _flip_batch_device
        # bf16 image upload (TPU.EVAL_TRANSFER_BF16): exact when the model
        # computes in bf16 (the backbone's first conv casts its input);
        # halves host->device image bytes — the dominant e2e eval cost on
        # a tunneled chip (tools/bench_eval_e2e.py)
        self._transfer_bf16 = bool(
            getattr(cfg.TPU, "EVAL_TRANSFER_BF16", True)
            and cfg.TPU.COMPUTE_DTYPE == "bfloat16")
        # static-calibrated int8 serving (TPU.INT8_STATIC): per-layer
        # activation abs-maxes recorded by calibrate() over N eval batches
        # (persisted via save/load_int8_scales), then every eval forward
        # reads them (vgg16.py int8_static). forward_batch falls back to a
        # single-batch lazy calibration for direct API users.
        self._needs_calib = bool(cfg.TPU.INT8_STATIC
                                 and cfg.TPU.INT8_EVAL_CONVS
                                 and "quant" not in variables)
        # TTA serving fast path (TPU.EVAL_DEVICE_RESIZE): upload the
        # original normalized images once and derive every TTA scale on
        # device (ops/device_resize.py) — labeled mode, not the
        # reference-parity host-PIL path (see config/defaults.py)
        self._device_resize = bool(
            getattr(cfg.TPU, "EVAL_DEVICE_RESIZE", False))
        self._pad_multiple = cfg.TPU.IMAGE_PAD_MULTIPLE

        # fused per-scale TTA step for the device-resize AVG path — the
        # module-level _fused_scale_step, shared across Inferencer
        # instances of the same model (no retrace per inference() call)
        self._fused_scale = partial(_fused_scale_step, self.model)
        self._calib = jax.jit(lambda v, b: self.model.apply(
            v, b, train=False, calibrate=True, mutable=["quant"]))

    def _calib_step(self, batch):
        """One calibration forward; merges the running abs-maxes (the
        model's calibrate path takes max(recorded, batch) when a quant
        collection is already present in the variables)."""
        _, quant = self._calib(self.variables, batch)
        self.variables = {**self.variables, **quant}

    def calibrate(self, eval_loader, n_batches: int):
        """Static-int8 calibration sweep: run bf16 calibration forwards on
        the first ``n_batches`` loader batches — across EVERY TTA transform
        when TTA is enabled, so the recorded abs-maxes cover the largest
        serving resolution — accumulating running per-layer maxima."""
        if not self._needs_calib:
            return
        transforms = (self.tta.transforms() if self.tta.enabled else None)
        n_done = 0
        for batch, samples, _ in eval_loader:
            if transforms is None:
                self._calib_step(batch)
            else:
                for tr in transforms:
                    self._calib_step(self.collator([tr(s) for s in samples]))
            n_done += 1
            if n_done >= n_batches:
                break
        self._needs_calib = False
        logger.info("int8 static calibration: %d batches swept", n_done)

    def forward_batch(self, batch):
        if self._needs_calib:
            self._calib_step(batch)
            self._needs_calib = False
        return self._fwd(self.variables, batch)

    @staticmethod
    def _match_mask(scores, mask):
        """REGRESS_HEUR=UNION returns R*P rows per image; tile the proposal
        mask to match (weak_head.py:135-142)."""
        import numpy as np
        k = scores.shape[1] // mask.shape[1]
        return np.tile(np.asarray(mask), (1, k)) if k > 1 else mask

    def _prep_scale(self, tr, samples):
        """Host work for one TTA scale: transform + collate + (bf16)
        upload. Runs in the prefetch worker so PIL resizes and the
        host->device transfer overlap device compute."""
        t_samples = [tr(s) for s in samples]
        batch = self.collator(t_samples)
        if self._transfer_bf16:
            # EXACT: the backbone casts images to bf16 before the first
            # conv either way (flax Conv dtype); casting on host (RTNE,
            # same as device) halves the tunnel bytes
            import ml_dtypes
            batch = batch.replace(
                images=batch.images.astype(ml_dtypes.bfloat16))
        batch = jax.device_put(batch)
        sizes = np.array([ts.size for ts in t_samples], np.float32)  # (w,h)
        return batch, sizes

    def _host_prep_batches(self, groups, samples):
        """Generator over (batch, sizes) per TTA group — host PIL resize +
        collate per scale, prefetched one scale ahead of device compute."""
        from concurrent import futures
        with futures.ThreadPoolExecutor(1) as pool:
            futs = [pool.submit(self._prep_scale, tr, samples)
                    for tr, _ in groups]
            for fut in futs:
                yield fut.result()

    def _prep_base(self, samples):
        """Original-size normalized batch (no resize/flip), uploaded once —
        the single host->device image transfer of the device-resize path."""
        from ..data.transforms import to_array, normalize

        base_samples = [normalize(to_array(s), self.tta.pixel_mean,
                                  self.tta.pixel_std, self.tta.to_bgr255)
                        for s in samples]
        base = self.collator(base_samples)
        if self._transfer_bf16:
            import ml_dtypes
            base = base.replace(images=base.images.astype(ml_dtypes.bfloat16))
        base = jax.device_put(base)
        in_hw = np.array([[s.size[1], s.size[0]] for s in samples],
                         np.float32)
        return base, in_hw

    def _scale_targets(self, tr, samples):
        """Per-image (h, w) targets for one TTA scale + the static padded
        canvas (same rounding rule as the collator)."""
        import math
        from ..data.transforms import get_resize_size
        tgt = np.array([get_resize_size(s.size, tr.min_size, tr.max_size)
                        for s in samples], np.float32)            # (h, w)
        m = self._pad_multiple
        canvas = (int(math.ceil(tgt[:, 0].max() / m) * m),
                  int(math.ceil(tgt[:, 1].max() / m) * m))
        return tgt, canvas

    def _device_resize_batches(self, groups, samples):
        """Generator over (batch, sizes) per TTA group — the
        TPU.EVAL_DEVICE_RESIZE fast path: ONE upload of the original
        normalized images, every scale derived on device by the
        PIL-convention matmul resampler (ops/device_resize.py). Used by
        the UNION heuristic; AVG takes the fused path (_fused_scale)."""
        import jax.numpy as jnp
        from ..ops.device_resize import resize_image_batch, scale_boxes_batch

        base, in_hw = self._prep_base(samples)
        in_hw_dev = jnp.asarray(in_hw)
        for tr, _ in groups:
            tgt, canvas = self._scale_targets(tr, samples)
            tgt_dev = jnp.asarray(tgt)
            images = resize_image_batch(base.images, in_hw_dev, tgt_dev,
                                        canvas)
            boxes = scale_boxes_batch(base.boxes, in_hw_dev, tgt_dev)
            batch = base.replace(images=images, boxes=boxes,
                                 image_sizes=tgt_dev)
            yield batch, tgt[:, ::-1]                             # (w, h)

    def _predict_samples_fused(self, samples, transforms, groups,
                               prepped_base=None):
        """Device-resize + AVG: one fused dispatch per scale group.
        ``prepped_base``: optional (base, in_hw) from _prep_base, prepared
        by a prefetch thread while the device ran the previous batch
        (inference() below) — host prep+upload then overlaps compute."""
        import jax.numpy as jnp

        base, in_hw = (prepped_base if prepped_base is not None
                       else self._prep_base(samples))
        in_hw_dev = jnp.asarray(in_hw)
        tgts, canvases = zip(*(self._scale_targets(tr, samples)
                               for tr, _ in groups))
        tgt0, _ = self._scale_targets(transforms[0], samples)
        tgt_all = jnp.asarray(np.stack(list(tgts) + [tgt0]))
        sums_s = sums_b = jnp.zeros(())
        first = True
        for si, ((tr, has_flip), canvas) in enumerate(zip(groups, canvases)):
            sums_s, sums_b = self._fused_scale(
                self.variables, base, in_hw_dev, tgt_all,
                sums_s, sums_b, si=si, canvas=canvas, has_flip=has_flip,
                first=first)
            first = False
        n = len(transforms)
        mask = self._match_mask(sums_s, base.box_mask)
        return self._finalize(sums_s / n, sums_b / n, mask)

    def predict_samples(self, samples: List[Sample],
                        prepped_base=None) -> List[Dict[str, np.ndarray]]:
        """samples: UNtransformed (original) Samples with rois; returns final
        per-image detections in the FIRST transform's coordinate frame
        (identity scale), like the reference (bbox_aug.py:17-24).

        Pipeline design (VERDICT r4 task 1 — the e2e eval fix): the naive
        loop ran EVERY (scale, flip) transform on host serially with device
        compute (14 PIL resize+collate+transfer rounds/batch; measured
        13x the device time on this tunnel). Here (a) each scale's flip
        twin is derived ON DEVICE (mirroring the normalized image's valid
        region + proposals commutes with normalization — bit-exact vs the
        host-flip transform, tests/test_eval_pipeline.py), so hosts
        prepare only the ~half unflipped scales; (b) images upload as
        bf16 (exact: the model casts to bf16 at the first conv); (c) a
        prefetch worker prepares scale s+1 while the device runs scale s.
        The AVG/UNION merge keeps the reference transform ORDER
        (bbox_aug.py:26-58), so merged outputs are unchanged."""
        if not self.tta.enabled:
            batch = self.collator(samples)
            scores, boxes = self.forward_batch(batch)
            return self._finalize(np.asarray(scores, np.float32),
                                  np.asarray(boxes, np.float32),
                                  self._match_mask(scores, batch.box_mask))

        import jax.numpy as jnp

        transforms = self.tta.transforms()
        groups = _tta_groups(transforms)
        if self._device_resize and self.tta.heur == "AVG":
            if self._needs_calib:
                # int8 static calibration sweeps the host path once
                self.calibrate([(None, samples, None)], 1)
            return self._predict_samples_fused(samples, transforms, groups,
                                               prepped_base)
        if self._device_resize:
            batches = self._device_resize_batches(groups, samples)
        else:
            batches = self._host_prep_batches(groups, samples)

        sum_scores = sum_boxes = None
        union_scores, union_boxes = [], []
        ref_sizes = None  # identity-transform sizes (w,h) per image
        mask0 = None
        t_i = 0
        for (tr, has_flip), (batch, sizes) in zip(groups, batches):
            per_group = [(self.forward_batch(batch), tr.flip)]
            if has_flip:
                fb = self._flip_batch(batch)
                per_group.append((self.forward_batch(fb), True))
            for (scores, boxes), flipped in per_group:
                if flipped:
                    boxes = _unflip_boxes_device(
                        boxes, jnp.asarray(sizes[:, 0]))
                if t_i == 0:
                    ref_sizes = sizes
                    mask0 = self._match_mask(scores, batch.box_mask)
                    sum_scores = scores
                    sum_boxes = boxes
                else:
                    # resize to the identity frame (on device)
                    rw = jnp.asarray(ref_sizes[:, 0] / sizes[:, 0])
                    rh = jnp.asarray(ref_sizes[:, 1] / sizes[:, 1])
                    boxes = _rescale_boxes_device(boxes, rw, rh)
                    if self.tta.heur == "AVG":
                        sum_scores = sum_scores + scores
                        sum_boxes = sum_boxes + boxes
                if self.tta.heur == "UNION":  # bbox_aug.py:56-58
                    union_scores.append(scores)
                    union_boxes.append(boxes)
                t_i += 1
        # proposal masks coincide across transforms (fixed proposals)
        if self.tta.heur == "UNION":
            n = len(transforms)
            scores_u = jnp.concatenate(union_scores, axis=1)
            boxes_u = jnp.concatenate(union_boxes, axis=1)
            mask_u = jnp.concatenate([mask0] * n, axis=1)
            return self._finalize(scores_u, boxes_u, mask_u)
        n = len(transforms)
        return self._finalize(sum_scores / n, sum_boxes / n, mask0)

    def _finalize(self, scores, boxes, box_mask):
        import jax.numpy as jnp
        b, p = scores.shape[:2]
        boxes_pc = (jnp.asarray(boxes).reshape(b, p, -1, 4)
                    if boxes.shape[-1] != 4 else jnp.asarray(boxes))
        out = finalize_detections_device(
            boxes_pc, jnp.asarray(scores), jnp.asarray(box_mask),
            self.nms_thresh, self.score_thresh, self.det_per_img)
        return detections_to_host(*out)

    def predict_batch(self, batch) -> List[Dict[str, np.ndarray]]:
        """Non-TTA batch -> per-image detections, dispatching on the model
        family's eval output protocol (tuple: WSOD; dict: supervised RCNN
        with optional detection-box mask pass; dict+valid: RetinaNet)."""
        import jax.numpy as jnp

        out = self.forward_batch(batch)
        if not isinstance(out, dict):
            scores, boxes = out
            return self._finalize(np.asarray(scores, np.float32),
                                  np.asarray(boxes, np.float32),
                                  self._match_mask(scores, batch.box_mask))
        if "valid" in out:          # RetinaNet decode -> per-class NMS
            b, k = out["scores"].shape
            c = self.model.num_classes
            sc = jnp.where(out["valid"], out["scores"], 0.0)
            scores_pc = jnp.zeros((b, k, c), jnp.float32)
            scores_pc = scores_pc.at[
                jnp.arange(b)[:, None], jnp.arange(k)[None, :],
                out["labels"]].set(sc)
            return self._finalize(scores_pc, out["boxes"],
                                  jnp.asarray(out["valid"]))
        # supervised RCNN: softmax scores + per-class decoded boxes
        tb, ts, tl, tv = finalize_detections_device(
            jnp.asarray(out["boxes"]).reshape(
                *out["scores"].shape[:2], -1, 4),
            jnp.asarray(out["scores"]), jnp.asarray(batch.box_mask),
            self.nms_thresh, self.score_thresh, self.det_per_img)
        dets = detections_to_host(tb, ts, tl, tv)
        if self.mask_on:
            probs = np.asarray(self._predict_masks(
                self.variables, batch, tb, tl), np.float32)
            tvn = np.asarray(tv)
            for i, d in enumerate(dets):
                d["mask_probs"] = probs[i][tvn[i]]
        return dets


def inference(model, variables, cfg, eval_loader, dataset, output_folder=None,
              task: str = "det", use_cached: bool = True, vis: bool = False,
              vis_limit: int = 20, timing_out: Optional[dict] = None):
    """Full dataset inference + evaluation (engine/inference.py:72-135).

    timing_out: when a dict is passed, the prediction-loop wall clock is
    recorded into it as {"n_images", "wall_s"} (tools/bench_eval_e2e.py) —
    the loop the reference times in its total_time log line
    (inference.py:99-112)."""
    from ..evaluation.voc_eval import do_voc_evaluation, do_corloc_evaluation
    from ..evaluation.coco_eval import do_coco_evaluation
    from ..data.voc import PascalVOCDataset

    pred_path = (os.path.join(output_folder, "predictions.pkl")
                 if output_folder else None)
    if pred_path and use_cached and os.path.exists(pred_path):
        with open(pred_path, "rb") as f:
            predictions = pickle.load(f)
        logger.info("Loaded cached predictions from %s", pred_path)
    else:
        inferencer = Inferencer(model, variables, cfg)
        if inferencer._needs_calib:
            # static-int8 serving: reuse persisted scales if present, else
            # sweep the first TPU.INT8_CALIB_BATCHES batches and persist
            scales_path = os.path.join(cfg.OUTPUT_DIR, "int8_scales.npz")
            if os.path.exists(scales_path):
                inferencer.variables = {**inferencer.variables,
                                        **load_int8_scales(scales_path)}
                inferencer._needs_calib = False
                logger.info("Loaded int8 scales from %s", scales_path)
            else:
                inferencer.calibrate(eval_loader, cfg.TPU.INT8_CALIB_BATCHES)
                if jax.process_index() == 0 and os.path.isdir(cfg.OUTPUT_DIR):
                    save_int8_scales(scales_path, inferencer.variables)
                    logger.info("Saved int8 scales to %s", scales_path)
        predictions = {}
        t0 = time.time()
        n_images = 0
        use_prefetch = (cfg.TEST.BBOX_AUG.ENABLED
                        and inferencer._device_resize
                        and inferencer.tta.heur == "AVG"
                        and not inferencer._needs_calib)
        if use_prefetch:
            # overlap the next batch's host prep + base upload with this
            # batch's device compute (one-step lookahead)
            from concurrent import futures as _futures
            _pool = _futures.ThreadPoolExecutor(1)

            def _iter():
                prev = None
                for item in eval_loader:
                    fut = _pool.submit(inferencer._prep_base, item[1])
                    if prev is not None:
                        yield prev[0] + (prev[1].result(),)
                    prev = (item, fut)
                if prev is not None:
                    yield prev[0] + (prev[1].result(),)
                _pool.shutdown()

            loop_iter = _iter()
        else:
            loop_iter = ((batch, samples, idxs, None)
                         for batch, samples, idxs in eval_loader)
        for batch, samples, idxs, prepped in loop_iter:
            if cfg.TEST.BBOX_AUG.ENABLED:
                dets = inferencer.predict_samples(samples, prepped)
                # identity frame -> original image frame. The identity
                # size follows from the resize RULE alone — computing it
                # via get_resize_size avoids a full per-image PIL
                # resize+normalize that the old tr0(s) call paid just to
                # read .size (tools/bench_eval_e2e.py host-side cost)
                from ..data.transforms import get_resize_size
                tr0 = inferencer.tta.transforms()[0]
                for d, s, idx in zip(dets, samples, idxs):
                    oh, ow = get_resize_size(s.size, tr0.min_size,
                                             tr0.max_size)
                    info = dataset.get_img_info(int(idx))
                    d = resize_detections(d, (ow, oh),
                                          (info["width"], info["height"]))
                    predictions[int(idx)] = d
            else:
                dets = inferencer.predict_batch(batch)
                for d, s, idx in zip(dets, samples, idxs):
                    info = dataset.get_img_info(int(idx))
                    d = resize_detections(d, s.size,
                                          (info["width"], info["height"]))
                    if "mask_probs" in d:
                        # paste per-roi probs into full-image binary masks
                        # at the ORIGINAL size (ref Masker flow)
                        from ..models.mask_head import Masker
                        d["masks"] = Masker()(d.pop("mask_probs"),
                                              d["boxes"], info["height"],
                                              info["width"])
                    predictions[int(idx)] = d
            n_images += len(samples)
        dt = time.time() - t0
        logger.info("Inference: %d images in %.1fs (%.4f s/img)",
                    n_images, dt, dt / max(n_images, 1))
        if timing_out is not None:
            timing_out["n_images"] = n_images
            timing_out["wall_s"] = dt
        predictions = gather_predictions(predictions, len(dataset),
                                         output_folder)
        if predictions is None:         # non-primary process: eval on rank 0
            return None
        if pred_path:
            with open(pred_path, "wb") as f:
                pickle.dump(predictions, f)

    if vis and output_folder:
        # annotated jpgs for the first images (reference engine/inference.py
        # vis_results; opt-in here instead of the reference's `if True:` quirk)
        from ..utils.visualize import vis_results
        from PIL import Image
        import os as _os
        imgs, dets = [], []
        for i in range(min(vis_limit, len(predictions))):
            info = dataset.get_img_info(i)
            img_path = _os.path.join(getattr(dataset, "root", ""),
                                     info["file_name"])
            if _os.path.exists(img_path):
                imgs.append(np.asarray(Image.open(img_path).convert("RGB")))
                dets.append(predictions[i])
        if imgs:
            vis_results(dets, imgs, _os.path.join(output_folder, "vis"),
                        class_names=getattr(dataset, "CLASSES", None))

    if task == "corloc":
        return do_corloc_evaluation(dataset, predictions, output_folder)
    if isinstance(dataset, PascalVOCDataset):
        return do_voc_evaluation(dataset, predictions, output_folder)
    # MASK_ON adds the segm task (reference inference.py:87 iou_types);
    # predictions must then carry full-image "masks" (mask_head.Masker)
    iou_types = (("bbox", "segm") if cfg.MODEL.MASK_ON else ("bbox",))
    return do_coco_evaluation(dataset, predictions, output_folder,
                              iou_types=iou_types)
