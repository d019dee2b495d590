"""Contrastive-mining parity vs the EXECUTED reference contra block.

Runs RoIRegLossComputation (loss.py:233-411) with contra=True on a ragged
batch, using deterministic stubs for the augmented views (drop = x*0.9,
noise = x*1.1, shared linear neck/sim projections), and records the
internals it feeds to od_layer and SupConLossV2. Asserts the rebuild's
stage A/B mining produces identical pseudo-GT instance sets, bank
membership, hardness values, and identical loss_img/ref terms.

loss_sim itself is NOT numerically compared: the reference appends
instance_diff in image-major order while concatenating banks class-major,
misaligning weights with entries (upstream quirk); the rebuild keeps them
aligned (documented in losses/supcon.py; SupConLossV2 math itself is
parity-tested in test_reference_parity.py).
"""

import numpy as np
import pytest

# executed-reference parity tier: minutes of cpu-torch execution
# (run with `pytest -m slow` — see pytest.ini)
pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import wetectron_shims  # noqa: E402

wetectron_shims.install()
CFG = wetectron_shims.reference_cfg()

D_POOL = 4 * 7 * 7   # stub pooled feature dim (4 channels, 7x7)
D_NECK = 16
D_SIM = 8


class StubExtractor:
    """Deterministic stand-in for VGG16FC67ROIFeatureExtractor's neck/view
    hooks (vgg16.py:164-193): drop/noise become fixed scalings so both
    frameworks compute identical augmented views."""

    def __init__(self, w_neck):
        self.w = w_neck

    def forward_neck(self, x):
        return x.reshape(x.shape[0], -1) @ self.w

    def drop_pool(self, x):
        return x * 0.9

    def noise_pool(self, x):
        return x * 1.1


class StubSim:
    def __init__(self, w_sim):
        self.w = w_sim

    def __call__(self, x):
        z = x @ self.w
        return z / z.norm(dim=1, keepdim=True).clamp(min=1e-12)


def test_contra_mining_parity():
    from wetectron.modeling.roi_heads.weak_head.loss import (
        RoIRegLossComputation)
    from odwscl_tpu.losses import (stage_a, stage_b, assemble_bank,
                                   wsddn_final_score, mil_loss, od_layer,
                                   refinement_cls_loss, refinement_reg_loss)

    rng = np.random.RandomState(21)
    c = 6
    p_per = [20, 16]
    gt_labels = [[2, 4], [1]]
    boxes, cls_logit, det_logit = [], [], []
    pooled, refs, bbox = [], [[], [], []], [[], [], []]
    for n in p_per:
        x1y1 = rng.uniform(0, 200, (n, 2))
        wh = rng.uniform(10, 120, (n, 2))
        boxes.append(np.concatenate([x1y1, np.minimum(x1y1 + wh, 255)],
                                    axis=1).astype(np.float32))
        cls_logit.append(rng.randn(n, c).astype(np.float32))
        det_logit.append(rng.randn(n, c).astype(np.float32))
        pooled.append(rng.randn(n, 4, 7, 7).astype(np.float32))
        for i in range(3):
            refs[i].append(rng.randn(n, c).astype(np.float32))
            bbox[i].append((rng.randn(n, 4 * c) * 0.2).astype(np.float32))
    w_neck = rng.randn(D_POOL, D_NECK).astype(np.float32) * 0.2
    w_sim = rng.randn(D_NECK, D_SIM).astype(np.float32) * 0.5
    # sim_feature for the CLEAN view comes in precomputed on both sides
    z_clean = [StubSim(torch.tensor(w_sim))(
        StubExtractor(torch.tensor(w_neck)).forward_neck(
            torch.tensor(pl))).numpy() for pl in pooled]

    # -- reference, with recorders ------------------------------------------
    CFG.MODEL.ROI_BOX_HEAD.NUM_CLASSES = c
    CFG.SOLVER.CONTRA = True
    CFG.MODEL.ROI_WEAK_HEAD.OICR_P = 0.0
    try:
        evaluator = RoIRegLossComputation(CFG)
    finally:
        CFG.SOLVER.CONTRA = False
    assert evaluator.contra
    rec_pgt, rec_bank = [], {}

    orig_od = evaluator.od_layer

    class RecOD:
        def __call__(self, proposals, source_score, labels, device,
                     pgt_instance, return_targets=False):
            rec_pgt.append([t.clone() for t in pgt_instance])
            return orig_od(proposals, source_score, labels, device,
                           pgt_instance, return_targets)

    evaluator.od_layer = RecOD()
    orig_sim_loss = evaluator.sim_loss

    class RecSim:
        def __call__(self, pgt_update, instance_diff, device):
            rec_bank["banks"] = [t.clone() for t in pgt_update]
            rec_bank["diff"] = instance_diff.clone()
            return orig_sim_loss(pgt_update, instance_diff, device)

    evaluator.sim_loss = RecSim()

    from wetectron.structures.bounding_box import BoxList
    proposals = [BoxList(torch.tensor(b), (256, 256), mode="xyxy")
                 for b in boxes]
    targets = []
    for gl in gt_labels:
        t = BoxList(torch.zeros(len(gl), 4), (256, 256), mode="xyxy")
        t.add_field("labels", torch.tensor(gl))
        targets.append(t)
    catn = lambda xs: torch.tensor(np.concatenate(xs))
    ref_losses, _ = evaluator(
        [catn(cls_logit)], [catn(det_logit)],
        [catn(r) for r in refs], [catn(b) for b in bbox],
        catn(z_clean), catn(pooled),
        StubExtractor(torch.tensor(w_neck)), StubSim(torch.tensor(w_sim)),
        proposals, targets)

    # -- rebuild --------------------------------------------------------------
    b, p = 2, 24
    pad = lambda xs: np.stack([np.pad(np.asarray(x), [(0, p - len(x))]
                               + [(0, 0)] * (np.asarray(x).ndim - 1))
                               for x in xs])
    bx = jnp.array(pad(boxes))
    mask = jnp.array(np.arange(p)[None] < np.array(p_per)[:, None])
    labels = np.zeros((b, c), np.float32)
    for i, gl in enumerate(gt_labels):
        labels[i, gl] = 1.0
    labels_fg = jnp.array(labels[:, 1:] > 0)
    final = wsddn_final_score(jnp.array(pad(cls_logit)),
                              jnp.array(pad(det_logit)), mask)
    ref_softmax = jnp.stack([jax.nn.softmax(jnp.array(pad(r)), axis=-1)
                             for r in refs])
    zc = jnp.array(pad(z_clean))
    pooled_j = jnp.array(pad(pooled))  # [B, P, 4, 7, 7]

    cap_a, cap_b = 64, 32
    a = stage_a(bx, mask, labels_fg, final, ref_softmax, CFG.thres, cap_a)
    slot_pooled = pooled_j[jnp.clip(a.slot_b, 0), a.slot_p]

    def neck_sim(x):
        z = x.reshape(x.shape[0], -1) @ jnp.array(w_neck) @ jnp.array(w_sim)
        return z / jnp.clip(jnp.linalg.norm(z, axis=1, keepdims=True), 1e-12)

    z_drop = neck_sim(slot_pooled * 0.9)
    z_noise = neck_sim(slot_pooled * 1.1)
    sb = stage_b(bx, mask, labels_fg, final, ref_softmax, zc, z_drop,
                 z_noise, a, CFG.nms, cap_b)

    # 1) pseudo-GT instance sets fed to od_layer match exactly
    assert len(rec_pgt) == 2 * 3
    k = 0
    for idx in range(b):
        for i in range(3):
            for cc in range(c - 1):
                ref_set = set(rec_pgt[k][cc].tolist())
                ours_set = set(np.nonzero(
                    np.asarray(sb.pgt_instance[i, idx, cc]))[0].tolist())
                assert ours_set == ref_set, (idx, i, cc, ours_set, ref_set)
            k += 1

    # 2) bank content: multiset of embeddings per class (clean + 2 views
    # from stage A, clean additions from stage B)
    feats_e, labels_e, hard_e, valid_e = assemble_bank(a, sb, zc, z_drop,
                                                       z_noise)
    ours_f = np.asarray(feats_e)[np.asarray(valid_e)]
    ours_l = np.asarray(labels_e)[np.asarray(valid_e)]
    ours_h = np.asarray(hard_e)[np.asarray(valid_e)]
    for cc in range(c - 1):
        ref_f = rec_bank["banks"][cc].numpy()
        mine = ours_f[ours_l == cc]
        assert len(mine) == len(ref_f), (cc, len(mine), len(ref_f))
        if len(mine) == 0:
            continue
        # sort rows lexicographically for multiset comparison
        np.testing.assert_allclose(
            mine[np.lexsort(mine.T)], ref_f[np.lexsort(ref_f.T)],
            rtol=1e-4, atol=1e-5, err_msg=f"class {cc}")
    np.testing.assert_allclose(np.sort(ours_h),
                               np.sort(rec_bank["diff"].numpy()),
                               rtol=1e-4, atol=1e-6)

    # 3) loss_img + all refinement terms (through od_layer) match
    ours = {"loss_img": mil_loss(final, jnp.array(labels))}
    for i in range(3):
        src = final if i == 0 else ref_softmax[i - 1]
        pl = od_layer(bx, mask, src[..., 1:], labels_fg, sb.pgt_instance[i],
                      fg_iou=CFG.MODEL.ROI_HEADS.FG_IOU_THRESHOLD,
                      gt_cap=16)
        lam = 3.0 if i == 0 else 1.0
        ours[f"loss_ref_cls{i}"] = lam * refinement_cls_loss(
            jnp.array(pad(refs[i])), pl.labels, pl.weights, mask)
        ours[f"loss_ref_reg{i}"] = lam * refinement_reg_loss(
            jnp.array(pad(bbox[i])), pl.labels, pl.weights, pl.reg_targets,
            mask, False)
    for key, val in ours.items():
        np.testing.assert_allclose(float(val), float(ref_losses[key]),
                                   rtol=2e-4, atol=1e-6, err_msg=key)
