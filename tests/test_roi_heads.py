"""CombinedROIHeads (supervised box+mask+keypoint dispatch): train losses
finite + correctly gated by MASK_ON/KEYPOINT_ON; eval outputs shaped; the
mask loss responds to targets (not a constant)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from odwscl_tpu.models.roi_heads import CombinedROIHeads, FastRCNNPredictor
from odwscl_tpu.models.vgg16 import VGGRoINeck


def _inputs(rng, b=2, p=16, r=7, c=32, g=3):
    pooled = jnp.asarray(rng.randn(b, p, r, r, c), jnp.float32)
    x1y1 = rng.uniform(0, 60, (b, p, 2))
    wh = rng.uniform(8, 30, (b, p, 2))
    boxes = jnp.asarray(np.concatenate([x1y1, x1y1 + wh], -1), jnp.float32)
    mask = jnp.asarray(np.arange(p)[None] < np.array([p, p - 4])[:, None])
    gt = jnp.asarray(np.concatenate(
        [x1y1[:, :g], x1y1[:, :g] + wh[:, :g]], -1), jnp.float32)
    gt_labels = jnp.asarray(rng.randint(1, 6, (b, g)), jnp.int32)
    gt_mask = jnp.asarray([[True, True, False], [True, False, False]])
    bitmasks = jnp.asarray((rng.rand(b, g, 96, 96) > 0.4), jnp.float32)
    kps = jnp.asarray(rng.rand(b, g, 17, 3) * 60, jnp.float32)
    return pooled, boxes, mask, gt, gt_labels, gt_mask, bitmasks, kps


def _heads(mask_on, keypoint_on):
    return CombinedROIHeads(
        num_classes=6,
        neck=VGGRoINeck(hidden_dim=64, compute_dtype=jnp.float32),
        mask_on=mask_on, keypoint_on=keypoint_on,
        batch_size_per_image=16, compute_dtype=jnp.float32)


def test_box_only_train_and_eval():
    rng = np.random.RandomState(0)
    pooled, boxes, mask, gt, gl, gm, bm, kp = _inputs(rng)
    heads = _heads(False, False)
    rngs = {"params": jax.random.PRNGKey(0),
            "augment": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = heads.init(rngs, pooled, boxes, mask, gt, gl, gm,
                           train=True)
    losses, metrics = heads.apply(variables, pooled, boxes, mask, gt, gl,
                                  gm, train=True, rngs=rngs)
    assert set(losses) == {"loss_classifier", "loss_box_reg"}
    assert all(np.isfinite(float(v)) for v in losses.values())
    assert 0.0 <= float(metrics["accuracy_cls"]) <= 1.0
    out = heads.apply(variables, pooled, boxes, mask, train=False,
                      rngs=rngs)
    assert out["scores"].shape == (2, 16, 6)
    assert out["boxes"].shape == (2, 16, 24)
    np.testing.assert_allclose(np.asarray(out["scores"].sum(-1)), 1.0,
                               rtol=1e-5)


def test_mask_and_keypoint_losses_gated_and_finite():
    rng = np.random.RandomState(1)
    pooled, boxes, mask, gt, gl, gm, bm, kp = _inputs(rng)
    heads = _heads(True, True)
    rngs = {"params": jax.random.PRNGKey(0),
            "augment": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = heads.init(rngs, pooled, boxes, mask, gt, gl, gm,
                           train=True, gt_bitmasks=bm, gt_keypoints=kp)
    losses, _ = heads.apply(variables, pooled, boxes, mask, gt, gl, gm,
                            train=True, gt_bitmasks=bm, gt_keypoints=kp,
                            rngs=rngs)
    assert {"loss_classifier", "loss_box_reg", "loss_mask",
            "loss_kp"} == set(losses)
    assert all(np.isfinite(float(v)) for v in losses.values())
    # the mask loss must respond to its targets: inverted gt bitmasks
    # change it (same params/rngs)
    losses2, _ = heads.apply(variables, pooled, boxes, mask, gt, gl, gm,
                             train=True, gt_bitmasks=1.0 - bm,
                             gt_keypoints=kp, rngs=rngs)
    assert abs(float(losses["loss_mask"]) - float(losses2["loss_mask"])) \
        > 1e-4
    # eval returns per-roi mask/keypoint logits
    out = heads.apply(variables, pooled, boxes, mask, train=False,
                      rngs=rngs)
    assert out["mask_logits"].shape == (2, 16, 14, 14, 6)
    assert out["kp_logits"].shape == (2, 16, 28, 28, 17)


def test_fast_rcnn_predictor_param_names():
    pred = FastRCNNPredictor(num_classes=6, compute_dtype=jnp.float32)
    p = pred.init(jax.random.PRNGKey(0), jnp.zeros((4, 64)))
    assert set(p["params"].keys()) == {"cls_score", "bbox_pred"}
    cls, reg = pred.apply(p, jnp.zeros((4, 64)))
    assert cls.shape == (4, 6) and reg.shape == (4, 24)
