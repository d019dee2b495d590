"""Parity tests that EXECUTE the reference code at /root/reference.

VERDICT r1 #1/#4: round 1 only tested against a hand-written numpy
transcription; a transcription bug would be invisible. These tests import
the actual wetectron modules (via tests/wetectron_shims.py) on cpu torch and
assert the rebuild matches to fp tolerance on identical inputs.
"""

import numpy as np
import pytest

# executed-reference parity tier: minutes of cpu-torch execution
# (run with `pytest -m slow` — see pytest.ini)
pytestmark = pytest.mark.slow

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
                          jnp.array(hard), jnp.ones(len(labels), bool), 0.2)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_supcon_plain_parity():
    from wetectron.modeling.roi_heads.sim_head.sim_loss import Supcon_Loss
    from odwscl_tpu.losses.supcon import supcon_loss

    rng = np.random.RandomState(5)
    enc, feats, labels = _bank(rng, [4, 2, 3])

    ref = Supcon_Loss(temp=0.2)(enc, "cpu")
    ours = supcon_loss(jnp.array(feats), jnp.array(labels),
                       jnp.ones(len(labels), bool), 0.2)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_supcon_v2_padded_slots_inert():
    """Invalid slots in the fixed-capacity layout must not change the loss."""
    from odwscl_tpu.losses.supcon import supcon_v2_loss

    rng = np.random.RandomState(6)
    _, feats, labels = _bank(rng, [3, 4])
    hard = rng.uniform(0.1, 1.0, len(labels)).astype(np.float32)
    a = supcon_v2_loss(jnp.array(feats), jnp.array(labels), jnp.array(hard),
                       jnp.ones(len(labels), bool), 0.2)
    pad = 5
    fp = np.concatenate([feats, rng.randn(pad, feats.shape[1]).astype(np.float32)])
    lp = np.concatenate([labels, np.zeros(pad, labels.dtype)])
    hp = np.concatenate([hard, np.ones(pad, np.float32)])
    vp = np.concatenate([np.ones(len(labels), bool), np.zeros(pad, bool)])
    b = supcon_v2_loss(jnp.array(fp), jnp.array(lp), jnp.array(hp),
                       jnp.array(vp), 0.2)
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


# ---------------------------------------------------------------------------
# full eval compute path: backbone -> neck -> predictor (weights imported)
# ---------------------------------------------------------------------------

def test_full_eval_path_parity(tmp_path):
    """Build the reference torch model, export a checkpoint, import it with
    utils/weight_import.import_reference_checkpoint, and compare the whole
    eval forward (backbone conv stack, fc6/fc7 neck, MIST predictor incl.
    its eval softmaxes, AVG box decoding) on one fixed image. ROIPool is
    bypassed with the CUDA-semantics numpy golden (the only CUDA-bound op).
    """
    import jax
    from odwscl_tpu.models import WSODDetector, Batch
    from odwscl_tpu.ops.roi_pool import roi_pool_numpy
    from odwscl_tpu.utils.weight_import import import_reference_checkpoint
    from wetectron.modeling.backbone import vgg16 as ref_vgg16
    from wetectron.modeling.roi_heads.weak_head import roi_weak_predictors
    from wetectron.structures.bounding_box import BoxList

    CFG.MODEL.BACKBONE.CONV_BODY = "VGG16-OICR"
    CFG.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 21
    torch.manual_seed(0)
    body = ref_vgg16.add_conv_body(CFG)
    extractor = ref_vgg16.VGG16FC67ROIFeatureExtractor(CFG, 512)
    predictor = roi_weak_predictors.MISTPredictor(CFG, 4096)
    body.eval(), extractor.eval(), predictor.eval()

    rng = np.random.RandomState(11)
    img = rng.randn(1, 3, 64, 64).astype(np.float32) * 30
    rois = np.array([[0.0, 0.0, 63.0, 63.0], [8.0, 8.0, 40.0, 48.0],
                     [16.0, 0.0, 63.0, 30.0], [4.0, 4.0, 12.0, 12.0],
                     [0.0, 32.0, 60.0, 60.0], [20.0, 20.0, 44.0, 44.0]],
                    np.float32)

    with torch.no_grad():
        feats = body(torch.tensor(img))[0]                 # [1,512,8,8]
        pooled = roi_pool_numpy(
            feats[0].permute(1, 2, 0).numpy(), rois, 0.125)
        pooled_t = torch.tensor(pooled).permute(0, 3, 1, 2).reshape(
            len(rois), -1)
        # the classifier flattens NCHW; our neck flattens NHWC -> feed the
        # SAME flat layout the importer's fc6 permutation expects (NCHW)
        roi_feats = extractor.classifier(pooled_t)
        bl = BoxList(torch.tensor(rois), (64, 64), mode="xyxy")
        cls_s, det_s, ref_s, bbox_p = predictor(roi_feats, [bl])

    # export a reference-format checkpoint
    sd = {}
    for k, v in body.state_dict().items():
        sd[f"backbone.{k}"] = v
    for k, v in extractor.state_dict().items():
        sd[f"roi_heads.feature_extractor.{k}"] = v
    for k, v in predictor.state_dict().items():
        sd[f"roi_heads.predictor.{k}"] = v
    path = str(tmp_path / "model_ref.pth")
    torch.save({"model": sd}, path)

    model = WSODDetector(num_classes=21, compute_dtype="float32",
                         pooler_win=16)
    batch = Batch(images=jnp.array(img.transpose(0, 2, 3, 1)),
                  image_sizes=jnp.array([[64.0, 64.0]]),
                  boxes=jnp.array(rois)[None],
                  box_mask=jnp.ones((1, len(rois)), bool))
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "augment": jax.random.PRNGKey(2)}, batch, train=False)
    params = import_reference_checkpoint(
        jax.device_get(variables["params"]), path)
    scores, boxes = jax.jit(model.apply, static_argnames=("train",))(
        {"params": params}, batch, train=False)

    # reference eval outputs: predictor returns softmaxed cls/det + ref
    # softmaxes; AVG heuristic = mean ref scores + mean decoded boxes
    ref_avg = torch.stack(ref_s).mean(0).numpy()
    np.testing.assert_allclose(np.asarray(scores[0]), ref_avg,
                               rtol=2e-3, atol=2e-5)
    from wetectron.modeling.box_coder import BoxCoder
    coder = BoxCoder(weights=(10.0, 10.0, 5.0, 5.0))
    ref_deltas = torch.stack(bbox_p).mean(0)
    ref_boxes = coder.decode(ref_deltas, torch.tensor(rois)).numpy()
    ref_boxes = ref_boxes.clip(0, 63)   # clip_to_image, TO_REMOVE=1
    np.testing.assert_allclose(np.asarray(boxes[0]).reshape(len(rois), 21, 4),
                               ref_boxes.reshape(len(rois), 21, 4),
                               rtol=1e-3, atol=5e-2)


# ---------------------------------------------------------------------------
# full non-contrastive loss dict (RoIRegLoss, contra=False -> oicr refinement)
# ---------------------------------------------------------------------------

def test_noncontra_loss_dict_parity():
    """Execute RoIRegLossComputation (loss.py:233-411) with contra=False on
    a ragged 2-image batch and match every loss/accuracy term against the
    rebuild's batched-masked composition (the detector's train_forward
    assembly for the OICR branch)."""
    import jax
    from wetectron.modeling.roi_heads.weak_head.loss import (
        RoIRegLossComputation)
    from odwscl_tpu.losses import (wsddn_final_score, mil_loss, oicr_layer,
                                   refinement_cls_loss, refinement_reg_loss,
                                   avg_image_accuracy)

    rng = np.random.RandomState(12)
    c = 21
    p_per = [30, 25]
    gt_labels = [[2, 5], [7]]
    boxes = [_random_boxes(rng, n) for n in p_per]
    cls_logit = [rng.randn(n, c).astype(np.float32) for n in p_per]
    det_logit = [rng.randn(n, c).astype(np.float32) for n in p_per]
    refs = [[rng.randn(n, c).astype(np.float32) for n in p_per]
            for _ in range(3)]
    bbox = [[(rng.randn(n, 4 * c) * 0.2).astype(np.float32) for n in p_per]
            for _ in range(3)]

    # -- reference --
    CFG.SOLVER.CONTRA = False
    CFG.MODEL.ROI_WEAK_HEAD.OICR_P = 0.0
    CFG.MODEL.ROI_BOX_HEAD.NUM_CLASSES = c
    try:
        evaluator = RoIRegLossComputation(CFG)
        proposals = [_boxlist(b) for b in boxes]
        targets = []
        for i, gl in enumerate(gt_labels):
            t = _boxlist(np.zeros((len(gl), 4), np.float32))
            t.add_field("labels", torch.tensor(gl))
            targets.append(t)
        catn = lambda xs: torch.tensor(np.concatenate(xs))
        ref_losses, ref_accs = evaluator(
            [catn(cls_logit)], [catn(det_logit)],
            [catn(r) for r in refs], [catn(b) for b in bbox],
            None, None, None, None, proposals, targets)
    finally:
        CFG.SOLVER.CONTRA = False  # the yacs default

    # -- rebuild (padded/masked; the detector's composition) --
    b, p = 2, 32
    pad = lambda xs, d: np.stack([np.pad(x, ((0, p - len(x)), (0, 0)))
                                  for x in xs])
    bx = jnp.array(pad(boxes, 4))
    mask = jnp.array(np.arange(p)[None, :] < np.array(p_per)[:, None])
    labels = np.zeros((b, c), np.float32)
    for i, gl in enumerate(gt_labels):
        labels[i, gl] = 1.0
    labels = jnp.array(labels)
    cls_j = jnp.array(pad(cls_logit, c))
    det_j = jnp.array(pad(det_logit, c))
    refs_j = [jnp.array(pad(r, c)) for r in refs]
    bbox_j = [jnp.array(pad(bb, 4 * c)) for bb in bbox]

    final = wsddn_final_score(cls_j, det_j, mask)
    ours = {"loss_img": mil_loss(final, labels)}
    labels_fg = labels[:, 1:] > 0
    ref_softmax = [jax.nn.softmax(r, axis=-1) for r in refs_j]
    for i in range(3):
        src = final if i == 0 else ref_softmax[i - 1]
        pl = oicr_layer(bx, mask, src[..., 1:], labels_fg, fg_iou=0.5)
        lam = 3.0 if i == 0 else 1.0
        ours[f"loss_ref_cls{i}"] = lam * refinement_cls_loss(
            refs_j[i], pl.labels, pl.weights, mask)
        ours[f"loss_ref_reg{i}"] = lam * refinement_reg_loss(
            bbox_j[i], pl.labels, pl.weights, pl.reg_targets, mask, False)

    for k in ("loss_img", "loss_ref_cls0", "loss_ref_cls1", "loss_ref_cls2",
              "loss_ref_reg0", "loss_ref_reg1", "loss_ref_reg2"):
        np.testing.assert_allclose(float(ours[k]), float(ref_losses[k]),
                                   rtol=2e-4, atol=1e-6, err_msg=k)

    img_score = jnp.clip(final.sum(axis=1), 1e-8, 1 - 1e-8)
    acc = avg_image_accuracy(jnp.clip(labels, 0, 1), img_score)
    np.testing.assert_allclose(float(acc), float(ref_accs["acc_img"]),
                               atol=1e-6)


def test_binary_cross_entropy_matches_torch():
    """torch F.binary_cross_entropy clamps log terms at -100: finite even at
    probs of exactly 0/1 (random-init FrozenBN ResNets saturate the WSDDN
    softmaxes and hit this)."""
    import torch.nn.functional as F
    from odwscl_tpu.ops.losses import binary_cross_entropy

    p = np.array([0.0, 1.0, 0.5, 1e-9, 1 - 1e-7, 0.3], np.float32)
    y = np.array([0.0, 0.0, 1.0, 1.0, 0.0, 1.0], np.float32)
    ref = F.binary_cross_entropy(torch.tensor(p), torch.tensor(y),
                                 reduction="none").numpy()
    ours = np.asarray(binary_cross_entropy(jnp.array(p), jnp.array(y)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_wsddn_and_roiloss_evaluator_parity():
    """WSDDNLossComputation (loss.py:50-95) and RoILossComputation
    (loss.py:95-170, the no-regression refinement) executed on a ragged
    batch vs the rebuild's composition (the detector's WSDDN and
    OICR+REGRESS_ON:False paths)."""
    import jax
    from wetectron.modeling.roi_heads.weak_head.loss import (
        WSDDNLossComputation, RoILossComputation)
    from odwscl_tpu.losses import (wsddn_final_score, mil_loss, oicr_layer,
                                   refinement_cls_loss)

    rng = np.random.RandomState(14)
    c = 8
    p_per = [18, 14]
    gt_labels = [[2, 5], [7]]
    boxes = [_random_boxes(rng, n) for n in p_per]
    cls_logit = [rng.randn(n, c).astype(np.float32) for n in p_per]
    det_logit = [rng.randn(n, c).astype(np.float32) for n in p_per]
    refs = [[rng.randn(n, c).astype(np.float32) for n in p_per]
            for _ in range(3)]

    proposals = [_boxlist(b) for b in boxes]
    targets = []
    for gl in gt_labels:
        t = _boxlist(np.zeros((len(gl), 4), np.float32))
        t.add_field("labels", torch.tensor(gl))
        targets.append(t)
    catn = lambda xs: torch.tensor(np.concatenate(xs))

    CFG.MODEL.ROI_BOX_HEAD.NUM_CLASSES = c
    CFG.MODEL.ROI_WEAK_HEAD.OICR_P = 0.0
    w_losses, w_accs = WSDDNLossComputation(CFG)(
        [catn(cls_logit)], [catn(det_logit)], None, proposals, targets)
    r_losses, r_accs = RoILossComputation(CFG)(
        [catn(cls_logit)], [catn(det_logit)],
        [catn(r) for r in refs], proposals, targets)

    # rebuild
    b, p = 2, 20
    pad = lambda xs: np.stack([np.pad(x, ((0, p - len(x)), (0, 0)))
                               for x in xs])
    bx = jnp.array(pad(boxes))
    mask = jnp.array(np.arange(p)[None] < np.array(p_per)[:, None])
    labels = np.zeros((b, c), np.float32)
    for i, gl in enumerate(gt_labels):
        labels[i, gl] = 1.0
    final = wsddn_final_score(jnp.array(pad(cls_logit)),
                              jnp.array(pad(det_logit)), mask)
    ours_img = float(mil_loss(final, jnp.array(labels)))
    np.testing.assert_allclose(ours_img, float(w_losses["loss_img"]),
                               rtol=2e-4)
    np.testing.assert_allclose(ours_img, float(r_losses["loss_img"]),
                               rtol=2e-4)

    labels_fg = jnp.array(labels[:, 1:] > 0)
    ref_softmax = [jax.nn.softmax(jnp.array(pad(r)), axis=-1) for r in refs]
    for i in range(3):
        src = final if i == 0 else ref_softmax[i - 1]
        pl = oicr_layer(bx, mask, src[..., 1:], labels_fg, fg_iou=0.5)
        lam = 3.0 if i == 0 else 1.0
        got = lam * refinement_cls_loss(jnp.array(pad(refs[i])), pl.labels,
                                        pl.weights, mask)
        np.testing.assert_allclose(float(got),
                                   float(r_losses[f"loss_ref{i}"]),
                                   rtol=2e-4, atol=1e-6, err_msg=str(i))


# ---------------------------------------------------------------------------
# ROI_sampler: partial-label proposal subsampling (VERDICT r2 missing #1)
# roi_sampler.py:16-232, called from weak_head.py:103-105
# ---------------------------------------------------------------------------

def _ref_roi_sampler(partial):
    from wetectron.modeling.roi_heads.weak_head.roi_sampler import ROI_sampler
    CFG.MODEL.ROI_WEAK_HEAD.PARTIAL_LABELS = partial
    try:
        return ROI_sampler(CFG)
    finally:
        CFG.MODEL.ROI_WEAK_HEAD.PARTIAL_LABELS = "none"


def test_roi_sampler_point_label_parity_and_sample_invariants():
    from wetectron.structures.keypoint import Click
    from odwscl_tpu.models.roi_sampler import (match_labels_point,
                                               subsample_proposals)
    import jax

    rng = np.random.RandomState(11)
    p, k = 600, 5
    boxes = _random_boxes(rng, p)
    clicks = rng.uniform(10, 290, (k, 2)).astype(np.float32)
    click_labels = rng.randint(1, 6, k)

    target = _boxlist(np.zeros((k, 4), np.float32))
    target.add_field("click", Click(torch.tensor(clicks), (320, 320)))
    target.add_field("labels", torch.tensor(click_labels))
    sampler = _ref_roi_sampler("point")

    # deterministic part: per-proposal label assignment must match exactly
    ref_labels = sampler.prepare_targets_point(
        [_boxlist(boxes)], [target])[0].numpy()
    ours_labels = np.asarray(match_labels_point(
        jnp.array(boxes)[None], jnp.array(clicks)[None],
        jnp.array(click_labels)[None], jnp.ones((1, k), bool)))[0]
    np.testing.assert_array_equal(ours_labels, ref_labels)

    # stochastic part: both samplers draw min(128, #pos) positives and fill
    # to 512 with negatives, pos from labels>0, neg from labels==0, in
    # original proposal order
    torch.manual_seed(0)
    ref_out = sampler([_boxlist(boxes.copy())], [target])[0]
    ref_sel_labels = ref_out.get_field("labels").numpy()
    n_pos_avail = int((ref_labels > 0).sum())
    n_pos_target = min(128, n_pos_avail)
    assert (ref_sel_labels > 0).sum() == n_pos_target

    sb, sm, idx = subsample_proposals(
        jax.random.PRNGKey(0), jnp.array(boxes)[None],
        jnp.ones((1, p), bool), jnp.array(ours_labels)[None], 512, 0.25)
    sm0, idx0 = np.asarray(sm[0]), np.asarray(idx[0])
    sel = idx0[sm0]
    assert (ours_labels[sel] > 0).sum() == n_pos_target
    assert sm0.sum() == len(ref_out)                  # same total count
    assert np.all(np.diff(sel) > 0)                   # original order kept
    assert np.all((ours_labels[sel] > 0) | (ours_labels[sel] == 0))
    np.testing.assert_array_equal(
        np.asarray(sb[0])[sm0], boxes[sel])           # gathered boxes


def test_roi_sampler_scribble_label_parity():
    from odwscl_tpu.models.roi_sampler import match_labels_scribble

    rng = np.random.RandomState(12)
    p, s = 400, 4
    boxes = _random_boxes(rng, p)
    scribbles = _random_boxes(rng, s)
    scribble_labels = rng.randint(1, 6, s)

    target = _boxlist(np.zeros((s, 4), np.float32))
    target.add_field("scribble", _boxlist(scribbles))
    target.add_field("labels", torch.tensor(scribble_labels))
    sampler = _ref_roi_sampler("scribble")
    ref_labels = sampler.prepare_targets_scribble(
        [_boxlist(boxes)], [target])[0].numpy()

    ours = np.asarray(match_labels_scribble(
        jnp.array(boxes)[None], jnp.array(scribbles)[None],
        jnp.array(scribble_labels)[None], jnp.ones((1, s), bool),
        CFG.MODEL.ROI_HEADS.FG_IOU_THRESHOLD,
        CFG.MODEL.ROI_HEADS.BG_IOU_THRESHOLD))[0]
    np.testing.assert_array_equal(ours, ref_labels)
