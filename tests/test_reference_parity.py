"""Parity tests that EXECUTE the reference code at /root/reference.

VERDICT r1 #1/#4: round 1 only tested against a hand-written numpy
transcription; a transcription bug would be invisible. These tests import
the actual wetectron modules (via tests/wetectron_shims.py) on cpu torch and
assert the rebuild matches to fp tolerance on identical inputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

import wetectron_shims  # noqa: E402

wetectron_shims.install()
CFG = wetectron_shims.reference_cfg()


def _boxlist(boxes, size=(320, 320)):
    from wetectron.structures.bounding_box import BoxList
    return BoxList(torch.tensor(boxes, dtype=torch.float32), size, mode="xyxy")


def _random_boxes(rng, n, lim=300.0):
    x1y1 = rng.uniform(0, lim - 40, (n, 2))
    wh = rng.uniform(5, 150, (n, 2))
    return np.concatenate([x1y1, np.minimum(x1y1 + wh, lim)],
                          axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# box coder
# ---------------------------------------------------------------------------

def test_box_coder_encode_decode_parity():
    from wetectron.modeling.box_coder import BoxCoder
    from odwscl_tpu.structures.boxes import encode_boxes, decode_boxes

    rng = np.random.RandomState(0)
    props = _random_boxes(rng, 24)
    gts = _random_boxes(rng, 24)
    weights = (10.0, 10.0, 5.0, 5.0)
    ref = BoxCoder(weights=weights)

    ref_enc = ref.encode(torch.tensor(gts), torch.tensor(props)).numpy()
    enc = np.asarray(encode_boxes(jnp.array(gts), jnp.array(props), weights))
    np.testing.assert_allclose(enc, ref_enc, rtol=1e-5, atol=1e-5)

    deltas = rng.randn(24, 8).astype(np.float32) * 0.4
    ref_dec = ref.decode(torch.tensor(deltas), torch.tensor(props)).numpy()
    dec = np.asarray(decode_boxes(jnp.array(deltas), jnp.array(props), weights))
    np.testing.assert_allclose(dec, ref_dec.reshape(dec.shape), rtol=1e-4,
                               atol=1e-3)


# ---------------------------------------------------------------------------
# pseudo-label generators
# ---------------------------------------------------------------------------

def _image_labels(rng, c, n_pos=3):
    lab = np.zeros(c, np.float32)
    lab[rng.choice(np.arange(1, c), size=n_pos, replace=False)] = 1.0
    return lab


def test_oicr_layer_parity():
    from wetectron.modeling.roi_heads.weak_head.pseudo_label_generator import (
        oicr_layer as ref_oicr)
    from odwscl_tpu.losses.pseudo_labels import oicr_layer

    rng = np.random.RandomState(1)
    p, c = 40, 6
    boxes = _random_boxes(rng, p)
    score = rng.dirichlet(np.ones(c), size=p).astype(np.float32)
    labels = _image_labels(rng, c)

    ref_lab, ref_w, ref_reg = ref_oicr()(
        _boxlist(boxes), torch.tensor(score), torch.tensor(labels),
        "cpu", return_targets=True)

    out = oicr_layer(jnp.array(boxes)[None], jnp.ones((1, p), bool),
                     jnp.array(score[:, 1:])[None],
                     jnp.array(labels[1:] > 0)[None],
                     fg_iou=CFG.MODEL.ROI_HEADS.FG_IOU_THRESHOLD)
    np.testing.assert_array_equal(np.asarray(out.labels[0]), ref_lab.numpy())
    np.testing.assert_allclose(np.asarray(out.weights[0]), ref_w.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.reg_targets[0]),
                               ref_reg.numpy(), rtol=1e-4, atol=1e-4)


def test_od_layer_parity():
    from wetectron.modeling.roi_heads.weak_head.pseudo_label_generator import (
        od_layer as ref_od)
    from odwscl_tpu.losses.pseudo_labels import od_layer

    rng = np.random.RandomState(2)
    p, c = 40, 6
    boxes = _random_boxes(rng, p)
    score = rng.dirichlet(np.ones(c), size=p).astype(np.float32)
    labels = _image_labels(rng, c)

    # mined instance sets: some classes empty (fallback path), some multi
    pgt_ref = [torch.zeros(0, dtype=torch.long) for _ in range(c - 1)]
    pgt_mask = np.zeros((c - 1, p), bool)
    pos = np.nonzero(labels[1:])[0]
    sets = {pos[0]: [3, 7, 11], pos[1]: [20]}  # pos[2] stays empty
    for cc, idxs in sets.items():
        pgt_ref[cc] = torch.tensor(idxs, dtype=torch.long)
        pgt_mask[cc, idxs] = True

    ref_lab, ref_w, ref_reg = ref_od()(
        _boxlist(boxes), torch.tensor(score), torch.tensor(labels),
        "cpu", pgt_ref, return_targets=True)

    out = od_layer(jnp.array(boxes)[None], jnp.ones((1, p), bool),
                   jnp.array(score[:, 1:])[None],
                   jnp.array(labels[1:] > 0)[None],
                   jnp.array(pgt_mask)[None],
                   fg_iou=CFG.MODEL.ROI_HEADS.FG_IOU_THRESHOLD)
    np.testing.assert_array_equal(np.asarray(out.labels[0]), ref_lab.numpy())
    np.testing.assert_allclose(np.asarray(out.weights[0]), ref_w.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.reg_targets[0]),
                               ref_reg.numpy(), rtol=1e-4, atol=1e-4)


def test_mist_layer_parity():
    from wetectron.modeling.roi_heads.weak_head.pseudo_label_generator import (
        mist_layer as ref_mist)
    from odwscl_tpu.losses.pseudo_labels import mist_layer

    rng = np.random.RandomState(3)
    p, c = 60, 6
    boxes = _random_boxes(rng, p)
    score = rng.dirichlet(np.ones(c), size=p).astype(np.float32)
    labels = _image_labels(rng, c)

    ref_lab, ref_w, ref_reg = ref_mist(0.15)(
        _boxlist(boxes), torch.tensor(score), torch.tensor(labels),
        "cpu", return_targets=True)

    out = mist_layer(jnp.array(boxes)[None], jnp.ones((1, p), bool),
                     jnp.array(score[:, 1:])[None],
                     jnp.array(labels[1:] > 0)[None], portion=0.15,
                     fg_iou=CFG.MODEL.ROI_HEADS.FG_IOU_THRESHOLD)
    np.testing.assert_array_equal(np.asarray(out.labels[0]), ref_lab.numpy())
    np.testing.assert_allclose(np.asarray(out.weights[0]), ref_w.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.reg_targets[0]),
                               ref_reg.numpy(), rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# contrastive losses
# ---------------------------------------------------------------------------

def _bank(rng, sizes, d=16):
    """Per-class embedding banks (L2-normalized) + the flat jax layout."""
    enc, feats, labels = [], [], []
    for c, n in enumerate(sizes):
        z = rng.randn(n, d).astype(np.float32)
        z /= np.linalg.norm(z, axis=1, keepdims=True) + 1e-12
        enc.append(torch.tensor(z))
        feats.append(z)
        labels.extend([c] * n)
    return enc, np.concatenate([f for f in feats if len(f)]), np.array(labels)


def test_supcon_v2_parity():
    from wetectron.modeling.roi_heads.sim_head.sim_loss import SupConLossV2
    from odwscl_tpu.losses.supcon import supcon_v2_loss

    rng = np.random.RandomState(4)
    enc, feats, labels = _bank(rng, [3, 0, 5, 2])
    hard = rng.uniform(0.1, 1.0, len(labels)).astype(np.float32)

    ref = SupConLossV2(temperature=0.2)(enc, torch.tensor(hard), "cpu")
    ours = supcon_v2_loss(jnp.array(feats), jnp.array(labels),
                          jnp.array(hard), jnp.ones(len(labels), bool),
                          jnp.ones(len(labels), jnp.int32), 0.2)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_supcon_plain_parity():
    from wetectron.modeling.roi_heads.sim_head.sim_loss import Supcon_Loss
    from odwscl_tpu.losses.supcon import supcon_loss

    rng = np.random.RandomState(5)
    enc, feats, labels = _bank(rng, [4, 2, 3])

    ref = Supcon_Loss(temp=0.2)(enc, "cpu")
    ours = supcon_loss(jnp.array(feats), jnp.array(labels),
                       jnp.ones(len(labels), bool),
                       jnp.ones(len(labels), jnp.int32), 0.2)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_supcon_v2_padded_slots_inert():
    """Invalid slots in the fixed-capacity layout must not change the loss."""
    from odwscl_tpu.losses.supcon import supcon_v2_loss

    rng = np.random.RandomState(6)
    _, feats, labels = _bank(rng, [3, 4])
    hard = rng.uniform(0.1, 1.0, len(labels)).astype(np.float32)
    a = supcon_v2_loss(jnp.array(feats), jnp.array(labels), jnp.array(hard),
                       jnp.ones(len(labels), bool),
                       jnp.ones(len(labels), jnp.int32), 0.2)
    pad = 5
    fp = np.concatenate([feats, rng.randn(pad, feats.shape[1]).astype(np.float32)])
    lp = np.concatenate([labels, np.zeros(pad, labels.dtype)])
    hp = np.concatenate([hard, np.ones(pad, np.float32)])
    vp = np.concatenate([np.ones(len(labels), bool), np.zeros(pad, bool)])
    b = supcon_v2_loss(jnp.array(fp), jnp.array(lp), jnp.array(hp),
                       jnp.array(vp), jnp.ones(len(lp), jnp.int32), 0.2)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


# ---------------------------------------------------------------------------
# partial-label filtering (loss.py:208-231)
# ---------------------------------------------------------------------------

def _roireg(partial):
    from wetectron.modeling.roi_heads.weak_head.loss import (
        RoIRegLossComputation)
    CFG.MODEL.ROI_WEAK_HEAD.PARTIAL_LABELS = partial
    try:
        return RoIRegLossComputation(CFG)
    finally:
        CFG.MODEL.ROI_WEAK_HEAD.PARTIAL_LABELS = "none"


def test_filter_pseudo_labels_point_parity():
    from wetectron.structures.keypoint import Click
    from odwscl_tpu.losses.partial_labels import filter_pseudo_labels_point

    rng = np.random.RandomState(8)
    p, k = 30, 4
    boxes = _random_boxes(rng, p)
    clicks = rng.uniform(10, 290, (k, 2)).astype(np.float32)
    click_labels = rng.randint(1, 6, k)
    pseudo = rng.randint(0, 6, p)

    target = _boxlist(np.zeros((k, 4), np.float32))
    target.add_field("click", Click(torch.tensor(clicks), (320, 320)))
    target.add_field("labels", torch.tensor(click_labels))
    ref = _roireg("point").filter_pseudo_labels(
        torch.tensor(pseudo.copy()), _boxlist(boxes), target)

    ours = filter_pseudo_labels_point(
        jnp.array(pseudo)[None], jnp.array(boxes)[None],
        jnp.array(clicks)[None], jnp.array(click_labels)[None],
        jnp.ones((1, k), bool))
    np.testing.assert_array_equal(np.asarray(ours[0]), ref.numpy())


def test_filter_pseudo_labels_scribble_parity():
    from odwscl_tpu.losses.partial_labels import filter_pseudo_labels_scribble

    rng = np.random.RandomState(9)
    p, s = 30, 4
    boxes = _random_boxes(rng, p)
    scribbles = _random_boxes(rng, s)
    scribble_labels = rng.randint(1, 6, s)
    pseudo = rng.randint(0, 6, p)

    target = _boxlist(np.zeros((s, 4), np.float32))
    target.add_field("scribble", _boxlist(scribbles))
    target.add_field("labels", torch.tensor(scribble_labels))
    ref = _roireg("scribble").filter_pseudo_labels(
        torch.tensor(pseudo.copy()), _boxlist(boxes), target)

    ours = filter_pseudo_labels_scribble(
        jnp.array(pseudo)[None], jnp.array(boxes)[None],
        jnp.array(scribbles)[None], jnp.array(scribble_labels)[None],
        jnp.ones((1, s), bool))
    np.testing.assert_array_equal(np.asarray(ours[0]), ref.numpy())
