"""Golden tests for WSDDN/MIL/refinement losses and SupCon edge cases."""

import jax
import jax.numpy as jnp
import numpy as np

from odwscl_tpu.losses import (wsddn_final_score, mil_loss,
                               refinement_cls_loss, refinement_reg_loss,
                               avg_image_accuracy, supcon_v2_loss, supcon_loss)
from odwscl_tpu.ops.losses import smooth_l1_loss


def test_wsddn_dual_softmax():
    rng = np.random.RandomState(0)
    cls = rng.randn(1, 5, 3).astype(np.float32)
    det = rng.randn(1, 5, 3).astype(np.float32)
    mask = np.array([[True, True, True, False, False]])
    out = np.asarray(wsddn_final_score(jnp.array(cls), jnp.array(det),
                                       jnp.array(mask)))

    def sm(x, axis):
        e = np.exp(x - x.max(axis=axis, keepdims=True))
        return e / e.sum(axis=axis, keepdims=True)

    want = sm(cls[0, :3], 1) * sm(det[0, :3], 0)
    np.testing.assert_allclose(out[0, :3], want, rtol=1e-4)
    assert np.all(out[0, 3:] == 0)  # pads contribute nothing


def test_mil_loss_matches_bce():
    score = jnp.array([[[0.2, 0.3], [0.1, 0.4]]])  # [1,2,2]
    labels = jnp.array([[0.0, 1.0]])
    got = float(mil_loss(score, labels))
    img = np.clip([0.3, 0.7], 1e-8, 1 - 1e-8)
    want = np.mean([-np.log(1 - img[0]), -np.log(img[1])])
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_refinement_cls_masked_mean():
    logits = jnp.array([[[2.0, 0.0], [0.0, 2.0], [9.0, 9.0]]])  # pad row
    labels = jnp.array([[0, 1, 0]])
    weights = jnp.array([[0.5, 1.0, 7.0]])
    mask = jnp.array([[True, True, False]])
    got = float(refinement_cls_loss(logits, labels, weights, mask))
    ce0 = -np.log(np.exp(2) / (np.exp(2) + 1))
    ce1 = -np.log(np.exp(2) / (np.exp(2) + 1))
    want = (0.5 * ce0 + 1.0 * ce1) / 2
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_refinement_reg_selects_class_columns():
    b, p, c = 1, 2, 3
    pred = jnp.arange(b * p * c * 4, dtype=jnp.float32).reshape(b, p, c * 4)
    labels = jnp.array([[2, 0]])
    weights = jnp.array([[1.0, 1.0]])
    targets = jnp.zeros((b, p, 4))
    mask = jnp.ones((b, p), bool)
    got = float(refinement_reg_loss(pred, labels, weights, targets, mask))
    # only proposal 0 is positive (label 2): columns 8..11 = values 8,9,10,11
    want = float(np.asarray(smooth_l1_loss(
        jnp.array([8.0, 9.0, 10.0, 11.0]), jnp.zeros(4))).sum()) / 2
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_avg_image_accuracy():
    labels = jnp.array([[0.0, 1.0, 0.0, 1.0]])
    scores = jnp.array([[0.9, 0.8, 0.1, 0.7]])  # top-2: classes 0, 1
    acc = float(avg_image_accuracy(labels, scores))
    np.testing.assert_allclose(acc, 0.5)


def test_supcon_v2_duplicate_rows_well_defined():
    """Duplicate bank entries (the stage-B max_index re-add fallback) flow
    through as repeated rows; the loss must stay finite and slot order must
    not matter."""
    rng = np.random.RandomState(0)
    z = rng.randn(6, 8)
    z /= np.linalg.norm(z, axis=1, keepdims=True)
    labels = np.array([0, 0, 1, 1, 1, 0])
    hard = rng.uniform(0.1, 1.0, 6)
    z_dup = np.concatenate([z, z[2:3]])
    l_dup = np.concatenate([labels, labels[2:3]])
    h_dup = np.concatenate([hard, hard[2:3]])
    a = float(supcon_v2_loss(jnp.array(z_dup), jnp.array(l_dup),
                             jnp.array(h_dup), jnp.ones(7, bool), 0.2))
    assert np.isfinite(a)
    perm = rng.permutation(7)
    b = float(supcon_v2_loss(jnp.array(z_dup[perm]), jnp.array(l_dup[perm]),
                             jnp.array(h_dup[perm]), jnp.ones(7, bool), 0.2))
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_supcon_grads_finite_with_invalid_and_zero_rows():
    z = np.zeros((8, 4), np.float32)
    z[:4] = np.eye(4)
    labels = jnp.array([0, 0, 1, 1, 0, 0, 0, 0])
    valid = jnp.array([True] * 4 + [False] * 4)

    def f(feats):
        return supcon_v2_loss(feats, labels, jnp.ones(8), valid, 0.2)

    g = jax.grad(f)(jnp.array(z))
    assert bool(jnp.all(jnp.isfinite(g)))

    def f2(feats):
        return supcon_loss(feats, labels, valid, 0.2)

    g2 = jax.grad(f2)(jnp.array(z))
    assert bool(jnp.all(jnp.isfinite(g2)))


def test_pgt_precision_recall_matches_reference_formulas():
    """utils/pgt_metrics vs a direct transcription of the reference's
    cal_precision_recall counting (utils/utils.py:80-94)."""
    from odwscl_tpu.utils.pgt_metrics import pgt_precision_recall
    from odwscl_tpu.structures.boxes import box_iou

    rng = np.random.RandomState(3)
    x1y1 = rng.uniform(0, 200, (1, 5, 2))
    gt = np.concatenate([x1y1, x1y1 + rng.uniform(20, 80, (1, 5, 2))], -1)
    x1y1 = rng.uniform(0, 200, (1, 8, 2))
    pgt = np.concatenate([x1y1, x1y1 + rng.uniform(20, 80, (1, 8, 2))], -1)
    # overlap some pgt with gt exactly
    pgt[0, 0] = gt[0, 0]
    pgt[0, 1] = gt[0, 1] + 3
    gt_mask = np.array([[True] * 4 + [False]])
    pgt_mask = np.array([[True] * 7 + [False]])

    out = pgt_precision_recall(jnp.array(gt, jnp.float32), jnp.array(gt_mask),
                               jnp.array(pgt, jnp.float32),
                               jnp.array(pgt_mask))
    # NB: signature is (pgt, pgt_mask, gt, gt_mask) — recompute directly
    out = pgt_precision_recall(jnp.array(pgt, jnp.float32),
                               jnp.array(pgt_mask),
                               jnp.array(gt, jnp.float32), jnp.array(gt_mask))
    iou = np.asarray(box_iou(jnp.array(gt[0, :4], jnp.float32),
                             jnp.array(pgt[0, :7], jnp.float32)))
    for t in (0.25, 0.5, 0.75):
        tp = int((iou > t).sum())
        fn = int((~(iou > t).any(axis=1)).sum())
        np.testing.assert_allclose(float(out[f"pgt_prec_{t:.2f}"]), tp / 7,
                                   atol=1e-6)
        np.testing.assert_allclose(float(out[f"pgt_rec_{t:.2f}"]),
                                   tp / max(tp + fn, 1), atol=1e-6)
