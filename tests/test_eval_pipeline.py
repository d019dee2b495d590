"""TTA eval pipeline fix (VERDICT r4 task 1): the device-side flip twin,
bf16 upload, and prefetch restructuring must not change results.

- the device flip of a collated batch is BIT-EXACT vs collating the
  host-flipped transform (mirror commutes with pixelwise normalize);
- predict_samples with the pipelined loop reproduces the naive
  per-transform host loop's merged detections (reference bbox_aug
  semantics) on the same samples.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from odwscl_tpu.config import get_default_cfg
from odwscl_tpu.data.transforms import EvalTransform, Sample
from odwscl_tpu.data.collate import BatchCollator
from odwscl_tpu.engine.inference import (Inferencer, TTAConfig,
                                         _flip_batch_device,
                                         _unflip_boxes_device,
                                         _rescale_boxes_device)


def _samples(n=2, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        h, w = 40 + 8 * i, 56 + 8 * i          # distinct sizes: pad differs
        img = Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8))
        rois = np.concatenate([rng.uniform(0, w // 2, (12, 1)),
                               rng.uniform(0, h // 2, (12, 1)),
                               rng.uniform(w // 2, w - 1, (12, 1)),
                               rng.uniform(h // 2, h - 1, (12, 1))], 1)
        out.append(Sample(image=img, size=(w, h), rois=rois.astype(np.float32),
                          gt_boxes=np.zeros((0, 4), np.float32),
                          gt_labels=np.zeros((0,), np.int64),
                          gt_difficult=np.zeros((0,), bool), image_id=i))
    return out


def _tta_cfg():
    cfg = get_default_cfg()
    cfg.merge_from_list([
        "TEST.BBOX_AUG.ENABLED", "True", "TEST.BBOX_AUG.H_FLIP", "True",
        "TEST.BBOX_AUG.HEUR", "AVG", "TEST.BBOX_AUG.SCALES", "(32, 64)",
        "TEST.BBOX_AUG.SCALE_H_FLIP", "True", "TEST.BBOX_AUG.MAX_SIZE", "96",
        "INPUT.MIN_SIZE_TEST", "48", "INPUT.MAX_SIZE_TEST", "96",
        "MODEL.ROI_BOX_HEAD.NUM_CLASSES", "7",
        "TPU.PROPOSAL_BUCKETS", "(16,)", "TPU.IMAGE_PAD_MULTIPLE", "32",
        "MODEL.ROI_HEADS.SCORE_THRESH", "0.0",
    ])
    return cfg


def test_device_flip_bit_exact_vs_host_flip():
    cfg = _tta_cfg()
    tta = TTAConfig(cfg)
    coll = BatchCollator(7, 32, 32, (16,))
    samples = _samples()
    tr = EvalTransform(48, 96, tta.pixel_mean, tta.pixel_std,
                       tta.to_bgr255, flip=False)
    trf = EvalTransform(48, 96, tta.pixel_mean, tta.pixel_std,
                        tta.to_bgr255, flip=True)
    unflipped = coll([tr(s) for s in samples])
    host_flipped = coll([trf(s) for s in samples])
    dev_flipped = jax.device_get(_flip_batch_device(jax.device_put(unflipped)))
    np.testing.assert_array_equal(np.asarray(dev_flipped.images),
                                  host_flipped.images)
    np.testing.assert_allclose(np.asarray(dev_flipped.boxes),
                               host_flipped.boxes, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(dev_flipped.box_mask),
                                  host_flipped.box_mask)


class _ToyModel:
    """Deterministic stand-in for the detector: scores/boxes are smooth
    functions of image content + proposals, so host/device paths that
    differ would show up in the merge."""

    num_refs = 1

    def apply(self, variables, batch, train=False):
        imgs = jnp.asarray(batch.images, jnp.float32)
        pooled = imgs.mean(axis=(1, 2))                       # [B, 3]
        base = jnp.tanh(batch.boxes.sum(-1) * 1e-3)           # [B, P]
        scores = jax.nn.softmax(
            base[..., None] + pooled[:, None, :].sum(-1, keepdims=True)
            + jnp.arange(7)[None, None, :] * 0.1, -1)
        boxes = jnp.tile(batch.boxes, (1, 1, 7))
        return scores, boxes


def _naive_predict(inferencer, samples):
    """The pre-fix loop: every transform on host, in reference order."""
    transforms = inferencer.tta.transforms()
    sum_scores = sum_boxes = None
    ref_sizes = mask0 = None
    for t_i, tr in enumerate(transforms):
        t_samples = [tr(s) for s in samples]
        batch = inferencer.collator(t_samples)
        scores, boxes = inferencer.model.apply(None, batch, train=False)
        sizes = np.array([ts.size for ts in t_samples], np.float32)
        if tr.flip:
            boxes = _unflip_boxes_device(boxes, jnp.asarray(sizes[:, 0]))
        if t_i == 0:
            ref_sizes, mask0 = sizes, batch.box_mask
            sum_scores, sum_boxes = scores, boxes
        else:
            rw = jnp.asarray(ref_sizes[:, 0] / sizes[:, 0])
            rh = jnp.asarray(ref_sizes[:, 1] / sizes[:, 1])
            boxes = _rescale_boxes_device(boxes, rw, rh)
            sum_scores = sum_scores + scores
            sum_boxes = sum_boxes + boxes
    n = len(transforms)
    return (np.asarray(sum_scores / n), np.asarray(sum_boxes / n))


def test_pipelined_predict_samples_matches_naive_loop(monkeypatch):
    cfg = _tta_cfg()
    cfg.merge_from_list(["TPU.EVAL_TRANSFER_BF16", "False"])  # f32 apples
    cfg.freeze()
    samples = _samples()
    inf = Inferencer(_ToyModel(), {}, cfg)
    inf._fwd = lambda v, b: inf.model.apply(v, b, train=False)
    want_scores, want_boxes = _naive_predict(inf, samples)

    got = {}
    orig_finalize = Inferencer._finalize

    def capture(self, scores, boxes, mask):
        got["scores"] = np.asarray(scores)
        got["boxes"] = np.asarray(boxes)
        return orig_finalize(self, scores, boxes, mask)

    monkeypatch.setattr(Inferencer, "_finalize", capture)
    inf.predict_samples(samples)
    np.testing.assert_allclose(got["scores"], want_scores, rtol=1e-6)
    np.testing.assert_allclose(got["boxes"], want_boxes, rtol=1e-5)


def test_bf16_upload_matches_f32_forward():
    """bf16(x) host cast == the model's own device cast: forwards agree."""
    import ml_dtypes
    from odwscl_tpu.models import WSODDetector, Batch

    rng = np.random.RandomState(0)
    model = WSODDetector(s2d_stem=True)
    b, h, w, p = 1, 64, 96, 16
    imgs = rng.randn(b, h, w, 3).astype(np.float32) * 50
    batch = Batch(images=jnp.asarray(imgs),
                  image_sizes=jnp.array([[h, w]], jnp.float32),
                  boxes=jnp.asarray(np.concatenate(
                      [rng.uniform(0, 40, (b, p, 2)),
                       rng.uniform(44, 90, (b, p, 2))], -1), jnp.float32),
                  box_mask=jnp.ones((b, p), bool),
                  labels=jnp.zeros((b, 21), jnp.float32))
    v = jax.jit(lambda r, bb: model.init(r, bb, method="init_all"))(
        {"params": jax.random.PRNGKey(0), "augment": jax.random.PRNGKey(1)},
        batch)
    s32, b32 = jax.jit(lambda v, bt: model.apply(v, bt, train=False))(
        v, batch)
    bb16 = batch.replace(images=jnp.asarray(
        imgs.astype(ml_dtypes.bfloat16)))
    s16, b16 = jax.jit(lambda v, bt: model.apply(v, bt, train=False))(
        v, bb16)
    np.testing.assert_array_equal(np.asarray(s32), np.asarray(s16))
    np.testing.assert_array_equal(np.asarray(b32), np.asarray(b16))
