"""CAM-attention proposal generation (models/cam_proposals.py) — the
MODEL.FASTER_RCNN=True path (reference: wetectron/modeling/rpn/rpn.py:154-190
CAM-hacked RPN + anchor_generator.py).

Covers: anchor grid geometry, the integral-image box-mean (exact, vs a
naive per-anchor loop), min-size filtering/NMS/static-shape output
invariants, and an end-to-end FASTER_RCNN=True train-step smoke (CAM loss
present, grads flow into the CAM conv, proposal gradients stopped).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odwscl_tpu.models.cam_proposals import _anchors, cam_to_proposals
from odwscl_tpu.models import WSODDetector, Batch

TO_REMOVE = 1.0


def test_anchor_grid_geometry():
    a = _anchors(4, 6, 8, sizes=(32,), ratios=(1.0,))
    assert a.shape == (4 * 6 * 1, 4)
    # first cell center (0.5*8, 0.5*8) = (4, 4); size-32 square anchor
    np.testing.assert_allclose(a[0], [4 - 16, 4 - 16, 4 + 16, 4 + 16])
    # anchor areas are preserved across ratios
    a2 = _anchors(1, 1, 8, sizes=(64,), ratios=(0.5, 1.0, 2.0))
    areas = (a2[:, 2] - a2[:, 0]) * (a2[:, 3] - a2[:, 1])
    np.testing.assert_allclose(areas, 64.0 * 64.0, rtol=1e-5)


def test_integral_image_box_mean_exact():
    """The objectness must equal sigmoid(mean of atten over the box's
    cell span) — check vs a naive loop for every kept proposal."""
    rng = np.random.RandomState(0)
    fh, fw, stride = 8, 10, 8
    atten = jnp.asarray(rng.randn(1, fh, fw).astype(np.float32))
    sizes = jnp.asarray([[fh * stride, fw * stride]], jnp.float32)
    boxes, mask, obj = jax.jit(
        lambda a: cam_to_proposals(a, sizes, stride, out_p=32, pre_nms=64,
                                   nms_thresh=0.99))(atten)
    boxes, mask, obj = map(np.asarray, (boxes, mask, obj))
    at = np.asarray(atten[0])
    assert mask.any()
    for i in np.flatnonzero(mask[0]):
        x1, y1, x2, y2 = boxes[0, i]
        cx1 = int(np.clip(np.floor(x1 / stride), 0, fw - 1))
        cy1 = int(np.clip(np.floor(y1 / stride), 0, fh - 1))
        cx2 = int(np.clip(np.ceil((x2 + 1) / stride), cx1 + 1, fw))
        cy2 = int(np.clip(np.ceil((y2 + 1) / stride), cy1 + 1, fh))
        want = 1.0 / (1.0 + np.exp(-at[cy1:cy2, cx1:cx2].mean()))
        assert abs(obj[0, i] - want) < 1e-5, (i, obj[0, i], want)


def test_proposal_invariants():
    rng = np.random.RandomState(1)
    fh, fw, stride = 12, 16, 8
    atten = jnp.asarray(rng.randn(2, fh, fw).astype(np.float32))
    sizes = jnp.asarray([[fh * stride, fw * stride],
                         [fh * stride - 30, fw * stride - 50]], jnp.float32)
    boxes, mask, obj = cam_to_proposals(atten, sizes, stride, out_p=64)
    boxes, mask, obj = map(np.asarray, (boxes, mask, obj))
    assert boxes.shape == (2, 64, 4) and mask.shape == (2, 64)
    for b in range(2):
        h, w = np.asarray(sizes)[b]
        kept = boxes[b][mask[b]]
        assert len(kept) > 0
        # clipped to image, min_size respected (remove_small_boxes(20))
        assert (kept[:, 0] >= 0).all() and (kept[:, 1] >= 0).all()
        assert (kept[:, 2] <= w - 1).all() and (kept[:, 3] <= h - 1).all()
        assert (kept[:, 2] - kept[:, 0] + TO_REMOVE >= 20).all()
        assert (kept[:, 3] - kept[:, 1] + TO_REMOVE >= 20).all()
        # scores sorted descending over the kept prefix
        sc = obj[b][mask[b]]
        assert (np.diff(sc) <= 1e-6).all()
        # padded tail is masked with zero score
        assert (obj[b][~mask[b]] == 0).all()


def test_faster_rcnn_train_smoke():
    """FASTER_RCNN=True: proposals come from CAM attention, batch.boxes is
    ignored; loss_cam present; grads reach cam_conv but NOT via the
    proposal coordinates (stop_gradient)."""
    model = WSODDetector(num_classes=6, mlp_dim=64, cap_a=64, cap_b=32,
                         gt_cap=16, pooler_win=8, compute_dtype="float32",
                         contra=False, faster_rcnn=True, rpn_post_nms=16)
    rng = np.random.RandomState(2)
    b, hw, c = 2, 64, 6
    images = jnp.array(rng.randn(b, hw, hw, 3), jnp.float32)
    labels = np.zeros((b, c), np.float32)
    labels[:, 1] = 1.0
    # boxes deliberately garbage: the CAM path must not read them
    batch = Batch(images, jnp.full((b, 2), float(hw)),
                  jnp.full((b, 4, 4), jnp.nan), jnp.ones((b, 4), bool),
                  jnp.array(labels))
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "augment": jax.random.PRNGKey(2)}, batch, train=True)

    @jax.jit
    def train_and_grad(params):
        def loss_fn(p):
            losses, _ = model.apply(
                {"params": p}, batch, train=True,
                rngs={"dropout": jax.random.PRNGKey(3),
                      "augment": jax.random.PRNGKey(4)})
            return jnp.sum(jnp.stack(list(losses.values()))), losses

        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return total, losses, grads

    total, losses, grads = train_and_grad(variables["params"])
    assert "loss_cam" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert np.isfinite(float(total))
    g = jax.tree_util.tree_leaves(grads["cam"])
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in g)
    assert any(float(jnp.abs(x).sum()) > 0 for x in g)
