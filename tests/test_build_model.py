"""Config-driven model builds for every family (VERDICT r4 task 2).

The reference builds each of these from a YAML (modeling/backbone/
backbone.py:15-78 registry + roi_heads.py:61-85 WSOD_ON/MASK_ON/
KEYPOINT_ON dispatch + rpn/retinanet RETINANET_ON); these tests pin the
rebuild's `models.build_model` to the same surface: each family
constructs from a CfgNode, initializes via the trainer's init protocol,
and runs one eval + one train step with finite losses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odwscl_tpu.config import get_default_cfg
from odwscl_tpu.models import (build_model, Batch, WSODDetector,
                               SupervisedRCNN, RetinaNetDetector)

RNGS = {"augment": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}


def _batch(c, with_masks=False, with_kp=False, seed=0):
    rng = np.random.RandomState(seed)
    b, h, w, p, g = 2, 64, 96, 32, 8
    gtb = np.concatenate([rng.uniform(0, 30, (b, g, 2)),
                          rng.uniform(34, 90, (b, g, 2))], -1)
    kw = {}
    if with_masks:
        kw["gt_bitmasks"] = jnp.asarray(rng.rand(b, g, h // 4, w // 4) > .5,
                                        jnp.float32)
    if with_kp:
        kw["gt_keypoints"] = jnp.asarray(np.concatenate(
            [rng.uniform(0, 60, (b, g, 17, 2)), np.ones((b, g, 17, 1))],
            -1), jnp.float32)
    return Batch(
        images=jnp.asarray(rng.randn(b, h, w, 3), jnp.float32),
        image_sizes=jnp.tile(jnp.array([[h, w]], jnp.float32), (b, 1)),
        boxes=jnp.asarray(np.concatenate(
            [rng.uniform(0, 40, (b, p, 2)), rng.uniform(44, 90, (b, p, 2))],
            -1), jnp.float32),
        box_mask=jnp.ones((b, p), bool),
        labels=jnp.ones((b, c), jnp.float32),
        gt_boxes=jnp.asarray(gtb, jnp.float32),
        gt_labels=jnp.asarray(rng.randint(1, c, (b, g)), jnp.int32),
        gt_mask=jnp.ones((b, g), bool), **kw)


def _init(model, batch):
    return jax.jit(lambda r, b: model.init(r, b, method="init_all"))(
        {"params": jax.random.PRNGKey(0), "augment": jax.random.PRNGKey(1)},
        batch)


def _supervised_cfg(body, mask_on=False, kp_on=False):
    cfg = get_default_cfg()
    cfg.MODEL.WSOD_ON = False
    cfg.MODEL.MASK_ON = mask_on
    cfg.MODEL.KEYPOINT_ON = kp_on
    cfg.MODEL.BACKBONE.CONV_BODY = body
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 7
    cfg.MODEL.ROI_BOX_HEAD.MLP_HEAD_DIM = 64
    cfg.MODEL.ROI_MASK_HEAD.CONV_LAYERS = (32, 32)
    return cfg


def test_wsod_dispatch_unchanged():
    cfg = get_default_cfg()
    assert isinstance(build_model(cfg), WSODDetector)


def test_supervised_fpn_mask_keypoint_build_and_step():
    cfg = _supervised_cfg("R-18-FPN", mask_on=True, kp_on=True)
    model = build_model(cfg)
    assert isinstance(model, SupervisedRCNN)
    batch = _batch(7, with_masks=True, with_kp=True)
    v = _init(model, batch)
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(v, batch)
    assert out["scores"].shape == (2, 32, 7)
    assert out["boxes"].shape == (2, 32, 28)
    losses, _ = jax.jit(lambda v, b: model.apply(
        v, b, train=True, rngs=RNGS))(v, batch)
    for k in ("loss_classifier", "loss_box_reg", "loss_mask", "loss_kp"):
        assert np.isfinite(float(losses[k])), k
    # detection-box mask pass: the engine's post-NMS protocol
    det_boxes = batch.boxes[:, :4]
    det_labels = jnp.ones((2, 4), jnp.int32)
    probs = jax.jit(lambda v, b, db, dl: model.apply(
        v, b, db, dl, method="predict_masks"))(v, batch, det_boxes,
                                               det_labels)
    assert probs.shape == (2, 4, 14, 14)
    assert float(probs.min()) >= 0.0 and float(probs.max()) <= 1.0


@pytest.mark.parametrize("body", ["VGG16-OICR", "FBNet-default"])
def test_supervised_other_bodies_build_and_step(body):
    cfg = _supervised_cfg(body)
    model = build_model(cfg)
    batch = _batch(7)
    v = _init(model, batch)
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(v, batch)
    assert out["scores"].shape == (2, 32, 7)
    losses, _ = jax.jit(lambda v, b: model.apply(
        v, b, train=True, rngs=RNGS))(v, batch)
    assert all(np.isfinite(float(x)) for x in losses.values())


def test_retinanet_from_cfg_build_and_step():
    cfg = get_default_cfg()
    cfg.MODEL.RETINANET_ON = True
    cfg.MODEL.BACKBONE.CONV_BODY = "R-18-FPN-RETINANET"
    cfg.MODEL.RETINANET.NUM_CLASSES = 7
    cfg.MODEL.RETINANET.PRE_NMS_TOP_N = 64
    model = build_model(cfg)
    assert isinstance(model, RetinaNetDetector)
    batch = _batch(7)
    v = _init(model, batch)
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(v, batch)
    assert out["boxes"].shape == (2, 64, 4)
    assert out["labels"].dtype == jnp.int32
    losses, mets = jax.jit(lambda v, b: model.apply(
        v, b, train=True))(v, batch)
    assert np.isfinite(float(losses["loss_retina_cls"]))
    assert np.isfinite(float(losses["loss_retina_reg"]))


def test_mask_resolution_guard():
    cfg = _supervised_cfg("R-18-FPN", mask_on=True)
    cfg.MODEL.ROI_MASK_HEAD.RESOLUTION = 28   # != 2 * pooler res 7
    with pytest.raises(ValueError, match="RESOLUTION"):
        build_model(cfg)


def test_supervised_smoke_configs_parse():
    for f in ("configs/coco/coco_mask_rcnn_smoke.yaml",
              "configs/coco/coco_retinanet_smoke.yaml"):
        cfg = get_default_cfg()
        cfg.merge_from_file(f)
        cfg.freeze()
        build_model(cfg)
