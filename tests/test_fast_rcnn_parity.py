"""Fast R-CNN strong box-head loss vs the EXECUTED reference
(wetectron/modeling/roi_heads/box_head/loss.py FastRCNNLossComputation).

Sampling is RNG-backed on both sides, so exact parity uses configurations
where the BalancedPositiveNegativeSampler is deterministic: batch size per
image >= the number of eligible proposals (everything pos/neg is sampled,
only between-threshold proposals drop). prepare_targets parity (matching,
labels, regression targets) is checked directly without sampling.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import wetectron_shims  # noqa: E402

wetectron_shims.install()
CFG = wetectron_shims.reference_cfg()


def _make_ref_evaluator(cls_agnostic=False, batch=64, fg=0.5, bg=0.3):
    from wetectron.modeling.roi_heads.box_head.loss import (
        make_roi_box_loss_evaluator)
    CFG.MODEL.ROI_HEADS.FG_IOU_THRESHOLD = fg
    CFG.MODEL.ROI_HEADS.BG_IOU_THRESHOLD = bg
    CFG.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = batch
    CFG.MODEL.ROI_HEADS.POSITIVE_FRACTION = 1.0  # cap >= all: deterministic
    CFG.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 6
    CFG.MODEL.CLS_AGNOSTIC_BBOX_REG = cls_agnostic
    return make_roi_box_loss_evaluator(CFG)


def _data(rng, b=2, p=24, g=3, lim=300.0):
    props, gts, glabs = [], [], []
    for _ in range(b):
        x1y1 = rng.uniform(0, lim - 60, (p, 2))
        wh = rng.uniform(10, 120, (p, 2))
        props.append(np.concatenate([x1y1, np.minimum(x1y1 + wh, lim)],
                                    1).astype(np.float32))
        gi = rng.randint(0, p, g)
        jit = rng.uniform(-6, 6, (g, 4)).astype(np.float32)
        gts.append(np.clip(props[-1][gi] + jit, 0, lim))
        glabs.append(rng.randint(1, 6, g))
    return props, gts, glabs


def _boxlists(props, gts, glabs, size=(300, 300)):
    from wetectron.structures.bounding_box import BoxList
    proposals, targets = [], []
    for pr, gt, gl in zip(props, gts, glabs):
        proposals.append(BoxList(torch.tensor(pr), size, mode="xyxy"))
        t = BoxList(torch.tensor(gt), size, mode="xyxy")
        t.add_field("labels", torch.tensor(gl))
        targets.append(t)
    return proposals, targets


@pytest.mark.parametrize("cls_agnostic", [False, True])
def test_fast_rcnn_loss_parity_all_sampled(cls_agnostic):
    from odwscl_tpu.losses.fast_rcnn import (prepare_fast_rcnn_targets,
                                             fast_rcnn_loss, FastRCNNTargets)

    rng = np.random.RandomState(7)
    b, p, c = 2, 24, 6
    props, gts, glabs = _data(rng, b=b, p=p)
    ev = _make_ref_evaluator(cls_agnostic=cls_agnostic, batch=p)
    proposals, targets = _boxlists(props, gts, glabs)

    torch.manual_seed(0)
    sampled = ev.subsample(proposals, targets)

    nreg = 8 if cls_agnostic else 4 * c
    logits_full = rng.randn(b, p, c).astype(np.float32)
    reg_full = (rng.randn(b, p, nreg) * 0.3).astype(np.float32)

    # reference consumes logits for the SAMPLED subset, in sampled order
    cls_list, reg_list = [], []
    for i, sp in enumerate(sampled):
        idx = ev.imgs_sampled_inds[i].numpy()
        cls_list.append(torch.tensor(logits_full[i][idx], requires_grad=True))
        reg_list.append(torch.tensor(reg_full[i][idx]))
    ref_cls, ref_box, ref_acc = ev([torch.cat(cls_list)], [torch.cat(reg_list)])

    # rebuild over the full padded grid; matcher/encode identical, and with
    # cap >= eligible count the sampler keeps everything eligible too
    tgt = prepare_fast_rcnn_targets(
        jax.random.PRNGKey(0),
        jnp.asarray(np.stack(props)), jnp.ones((b, p), bool),
        jnp.asarray(np.stack(gts)), jnp.asarray(np.stack(glabs)),
        jnp.ones((b, 3), bool), fg_iou=0.5, bg_iou=0.3,
        batch_size_per_image=p, positive_fraction=1.0)
    ours_cls, ours_box, ours_acc = fast_rcnn_loss(
        jnp.asarray(logits_full), jnp.asarray(reg_full), tgt,
        cls_agnostic_bbox_reg=cls_agnostic)

    # same sampled multiset?
    n_ref = sum(len(ev.imgs_sampled_inds[i]) for i in range(b))
    n_ours = int((tgt.pos_mask | tgt.neg_mask).sum())
    assert n_ref == n_ours
    np.testing.assert_allclose(float(ours_cls), float(ref_cls), rtol=1e-5)
    np.testing.assert_allclose(float(ours_box), float(ref_box), rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_allclose(float(ours_acc), float(ref_acc), rtol=1e-5)


def test_prepare_targets_parity():
    """Matching sentinels, label assignment and regression encodings match
    the reference's prepare_targets exactly (no sampling involved)."""
    from odwscl_tpu.losses.fast_rcnn import prepare_fast_rcnn_targets

    rng = np.random.RandomState(11)
    b, p = 2, 32
    props, gts, glabs = _data(rng, b=b, p=p, g=4)
    ev = _make_ref_evaluator(batch=p, fg=0.6, bg=0.25)
    proposals, targets = _boxlists(props, gts, glabs)
    ref_labels, ref_regs = ev.prepare_targets(proposals, targets)

    tgt = prepare_fast_rcnn_targets(
        jax.random.PRNGKey(1),
        jnp.asarray(np.stack(props)), jnp.ones((b, p), bool),
        jnp.asarray(np.stack(gts)), jnp.asarray(np.stack(glabs)),
        jnp.ones((b, 4), bool), fg_iou=0.6, bg_iou=0.25,
        batch_size_per_image=p, positive_fraction=1.0)

    for i in range(b):
        rl = ref_labels[i].numpy()
        ol = np.asarray(tgt.labels[i])
        np.testing.assert_array_equal(ol, rl)
        rr = ref_regs[i].numpy()
        onr = np.asarray(tgt.reg_targets[i])
        # reg targets only meaningful where matched (labels > 0 suffices:
        # the loss reads them only at sampled positives)
        sel = rl > 0
        np.testing.assert_allclose(onr[sel], rr[sel], rtol=1e-4, atol=1e-4)
