"""Lockstep training-trajectory parity vs the EXECUTED reference
(VERDICT r2 next #3): ~40 optimization iterations of the reference's real
modules + solver (wetectron vgg16 body, VGG16FC67 extractor, MISTPredictor,
Sim_Net, RoIRegLossComputation, make_optimizer/make_lr_scheduler and the
do_train momentum-correction block, trainer.py:52-158) against the
rebuild's jitted train step, from an aligned init (weight_import) on
identical synthetic batches.

Determinism alignment (documented deviations from a production run):
- fc dropout p=0 on both sides (torch RNG is not replayable in jax);
- DB.METHOD none (no DropBlock augmentation of predictor inputs);
- the contrastive drop/noise views are deterministic scalings x0.9 / x1.1
  (patched on BOTH sides), so the stage A/B mining, banks and SupCon loss
  are exercised lockstep rather than statistically.
Everything else — conv stack, pooling (CUDA ROIPool semantics), WSDDN
softmaxes, pseudo-label mining, per-branch CE/smooth-L1, SGD groups
(bias 2xLR, 0 wd), linear warmup, milestone decay + Sutskever momentum
correction — runs the real code on both sides.
"""

import os
import tempfile

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import wetectron_shims  # noqa: E402

wetectron_shims.install()
CFG = wetectron_shims.reference_cfg()

C = 6          # num classes (incl background)
MAX_ITER = 40
WARMUP_ITERS = 6
# inside the tight-tracking window (below) so the gamma decay + Sutskever
# momentum correction are validated pointwise, not statistically
MILESTONE = 10
BASE_LR = 0.02
# Pointwise lockstep holds only until the first discrete mining flip:
# conv/pool fp drift (torch-CPU vs XLA-CPU accumulation orders) compounds
# through SGD until some >=-comparison in the pseudo-label miner lands on
# the other side (observed first flip: iter 14 on this seed), after which
# the two trajectories are legitimately different optimizations. Tight
# per-term tracking is asserted through TIGHT_ITERS (covers warmup end at
# 6 and the milestone at 10); after that only a statistical envelope.
TIGHT_ITERS = 13


def _torch_roi_pool(feats, rois, scale, res=7):
    """Differentiable torch ROIPool with the CUDA kernel's exact
    rounding/empty-bin semantics (ROIPool_cuda.cu:30-60; mirrors
    odwscl_tpu/ops/roi_pool.py roi_pool_numpy)."""
    c, h, w = feats.shape
    outs = []
    for n in range(rois.shape[0]):
        x1 = int(np.floor(rois[n, 0] * scale + 0.5))
        y1 = int(np.floor(rois[n, 1] * scale + 0.5))
        x2 = int(np.floor(rois[n, 2] * scale + 0.5))
        y2 = int(np.floor(rois[n, 3] * scale + 0.5))
        roi_w = max(x2 - x1 + 1, 1)
        roi_h = max(y2 - y1 + 1, 1)
        rows = []
        for ph in range(res):
            cols = []
            for pw in range(res):
                hs = min(max(ph * roi_h // res + y1, 0), h)
                he = min(max(-((ph + 1) * roi_h // -res) + y1, 0), h)
                ws = min(max(pw * roi_w // res + x1, 0), w)
                we = min(max(-((pw + 1) * roi_w // -res) + x1, 0), w)
                if he <= hs or we <= ws:
                    cols.append(feats.new_zeros(c))
                else:
                    cols.append(feats[:, hs:he, ws:we].amax(dim=(1, 2)))
            rows.append(torch.stack(cols, dim=1))        # [C, res]
        outs.append(torch.stack(rows, dim=1))            # [C, res, res]
    return torch.stack(outs)                             # [N, C, res, res]


def _make_data(rng, n_batches=4, b=2, hw=64, p_per=(14, 11)):
    batches = []
    for _ in range(n_batches):
        imgs = (rng.randn(b, 3, hw, hw) * 20).astype(np.float32)
        rois, gls = [], []
        for n in p_per:
            x1y1 = rng.uniform(0, hw - 20, (n, 2))
            wh = rng.uniform(8, 40, (n, 2))
            rois.append(np.concatenate(
                [x1y1, np.minimum(x1y1 + wh, hw - 1)], 1).astype(np.float32))
            gls.append(sorted(set(rng.randint(1, C, size=2).tolist())))
        batches.append((imgs, rois, gls))
    return batches


def _build_reference(contra, lmda, seed=3):
    from wetectron.modeling.backbone import vgg16 as ref_vgg16
    from wetectron.modeling.roi_heads.weak_head import roi_weak_predictors
    from wetectron.modeling.roi_heads.sim_head.sim_net import Sim_Net
    from wetectron.modeling.roi_heads.weak_head.loss import (
        RoIRegLossComputation)

    CFG.MODEL.BACKBONE.CONV_BODY = "VGG16-OICR"
    CFG.MODEL.ROI_BOX_HEAD.NUM_CLASSES = C
    CFG.SOLVER.CONTRA = contra
    CFG.MODEL.ROI_WEAK_HEAD.OICR_P = 0.0
    CFG.lmda = lmda
    torch.manual_seed(seed)
    body = ref_vgg16.add_conv_body(CFG)                  # freezes at 2
    extractor = ref_vgg16.VGG16FC67ROIFeatureExtractor(CFG, 512)
    predictor = roi_weak_predictors.MISTPredictor(CFG, 4096)
    sim = Sim_Net(CFG, 4096)
    try:
        evaluator = RoIRegLossComputation(CFG)
    finally:
        CFG.SOLVER.CONTRA = False
        CFG.lmda = 0.1
    net = torch.nn.Module()
    net.backbone = body
    net.add_module("fe", extractor)
    net.add_module("pred", predictor)
    net.add_module("sim", sim)
    net.train()
    for m in net.modules():                              # determinism: no
        if isinstance(m, torch.nn.Dropout):              # fc dropout
            m.p = 0.0
    # deterministic contrastive views (see module docstring)
    extractor.drop_pool = lambda x: x * 0.9
    extractor.noise_pool = lambda x: x * 1.1
    return net, body, extractor, predictor, sim, evaluator


def _export_checkpoint(body, extractor, predictor, sim, path):
    sd = {}
    for k, v in body.state_dict().items():
        sd[f"backbone.{k}"] = v
    for k, v in extractor.state_dict().items():
        sd[f"roi_heads.feature_extractor.{k}"] = v
    for k, v in predictor.state_dict().items():
        sd[f"roi_heads.predictor.{k}"] = v
    for k, v in sim.state_dict().items():
        sd[f"roi_heads.model_sim.{k}"] = v
    torch.save({"model": sd}, path)


def _ref_solver(net):
    """Reference make_optimizer + WarmupMultiStepLR on the local cfg."""
    from wetectron.solver.build import make_optimizer, make_lr_scheduler

    CFG.SOLVER.BASE_LR = BASE_LR
    CFG.SOLVER.BIAS_LR_FACTOR = 2
    CFG.SOLVER.MOMENTUM = 0.9
    CFG.SOLVER.WEIGHT_DECAY = 0.0005
    CFG.SOLVER.WEIGHT_DECAY_BIAS = 0.0
    CFG.SOLVER.WARMUP_FACTOR = 1.0 / 3
    CFG.SOLVER.WARMUP_ITERS = WARMUP_ITERS
    CFG.SOLVER.WARMUP_METHOD = "linear"
    CFG.SOLVER.STEPS = (MILESTONE,)
    CFG.SOLVER.GAMMA = 0.1
    CFG.SOLVER.MAX_ITER = MAX_ITER
    opt = make_optimizer(CFG, net)
    sched = make_lr_scheduler(CFG, opt)
    return opt, sched


def _update_momentum(optimizer, cur_lr, new_lr, thresh=1.1, eps=1e-10):
    """trainer.py:38-51 verbatim semantics."""
    ratio = max(new_lr / max(cur_lr, eps), cur_lr / max(new_lr, eps))
    if ratio > thresh:
        correction = new_lr / cur_lr
        for group in optimizer.param_groups:
            for p in group["params"]:
                st = optimizer.state[p]
                if "momentum_buffer" in st:
                    st["momentum_buffer"] *= correction


def _run_reference(contra, lmda, batches, ckpt_path, max_iter=MAX_ITER):
    from wetectron.structures.bounding_box import BoxList

    net, body, extractor, predictor, sim, evaluator = _build_reference(
        contra, lmda)
    _export_checkpoint(body, extractor, predictor, sim, ckpt_path)
    opt, sched = _ref_solver(net)
    curves = []
    for it in range(max_iter):
        cur_lr = opt.param_groups[0]["lr"]
        sched.step()
        new_lr = opt.param_groups[0]["lr"]
        if cur_lr > 1e-7 and cur_lr != new_lr:
            _update_momentum(opt, cur_lr, new_lr)
        imgs, rois, gls = batches[it % len(batches)]
        feats = body(torch.tensor(imgs))[0]              # [B,512,8,8]
        pooled = torch.cat([
            _torch_roi_pool(feats[i], rois[i], 0.125)
            for i in range(len(rois))])                  # [N,512,7,7]
        roi_feats = extractor.forward_neck(pooled)
        sim_feature = sim(roi_feats)
        proposals = [BoxList(torch.tensor(r), (64, 64), mode="xyxy")
                     for r in rois]
        cls_s, det_s, ref_s, bbox_p = predictor(roi_feats, proposals)
        targets = []
        for gl in gls:
            t = BoxList(torch.zeros(len(gl), 4), (64, 64), mode="xyxy")
            t.add_field("labels", torch.tensor(gl))
            targets.append(t)
        losses, _ = evaluator([cls_s], [det_s], ref_s, bbox_p, sim_feature,
                              pooled, extractor, sim, proposals, targets)
        total = sum(losses.values())
        opt.zero_grad()
        total.backward()
        opt.step()
        curves.append({k: float(v) for k, v in losses.items()})
    return curves


def _run_rebuild(contra, lmda, batches, ckpt_path, max_iter=MAX_ITER):
    from odwscl_tpu.models import WSODDetector, Batch
    from odwscl_tpu.models import detector as detector_mod
    from odwscl_tpu.config import get_default_cfg
    from odwscl_tpu.engine.trainer import create_train_state, make_train_step
    from odwscl_tpu.utils.weight_import import import_reference_checkpoint

    cfg = get_default_cfg()
    cfg.SOLVER.BASE_LR = BASE_LR
    cfg.SOLVER.BIAS_LR_FACTOR = 2
    cfg.SOLVER.MOMENTUM = 0.9
    cfg.SOLVER.WEIGHT_DECAY = 0.0005
    cfg.SOLVER.WEIGHT_DECAY_BIAS = 0.0
    cfg.SOLVER.WARMUP_FACTOR = 1.0 / 3
    cfg.SOLVER.WARMUP_ITERS = WARMUP_ITERS
    cfg.SOLVER.WARMUP_METHOD = "linear"
    cfg.SOLVER.STEPS = (MILESTONE,)
    cfg.SOLVER.GAMMA = 0.1
    cfg.SOLVER.MAX_ITER = MAX_ITER

    # deterministic contrastive views matching the reference patch
    orig_drop = detector_mod.dropblock_2d
    orig_noise = detector_mod.noise_augment
    detector_mod.dropblock_2d = lambda rng, x, p, s, valid=None: x * 0.9
    detector_mod.noise_augment = lambda rng, x: x * 1.1
    try:
        model = WSODDetector(num_classes=C, compute_dtype="float32",
                             pooler_win=16, db_method="none",
                             contra=contra, lmda=lmda, neck_dropout=0.0)
        p = 16
        jb = []
        for imgs, rois, gls in batches:
            b = len(rois)
            boxes = np.zeros((b, p, 4), np.float32)
            mask = np.zeros((b, p), bool)
            labels = np.zeros((b, C), np.float32)
            for i, r in enumerate(rois):
                boxes[i, :len(r)] = r
                mask[i, :len(r)] = True
                labels[i, gls[i]] = 1.0
            jb.append(Batch(jnp.array(imgs.transpose(0, 2, 3, 1)),
                            jnp.full((b, 2), 64.0), jnp.array(boxes),
                            jnp.array(mask), jnp.array(labels)))
        state, tx, _ = create_train_state(model, cfg, jb[0],
                                          jax.random.PRNGKey(0),
                                          freeze_conv_count=4)
        params = import_reference_checkpoint(
            jax.device_get(state.params), ckpt_path)
        state = state.replace(params=jax.tree_util.tree_map(jnp.asarray,
                                                            params),
                              opt_state=tx.init(jax.tree_util.tree_map(
                                  jnp.asarray, params)))
        step = jax.jit(make_train_step(model, tx))
        curves = []
        for it in range(max_iter):
            state, logs = step(state, jb[it % len(jb)])
            curves.append({k: float(v) for k, v in logs.items()})
        return curves
    finally:
        detector_mod.dropblock_2d = orig_drop
        detector_mod.noise_augment = orig_noise


def _compare(ref_curves, our_curves, keys, label, tight_iters=TIGHT_ITERS,
             tol_scale=1.0):
    """Per-term pointwise tracking through `tight_iters` (fp-drift envelope
    growing with iteration count), then a statistical envelope: past the
    first discrete mining flip the trajectories are different-but-equally-
    valid optimizations, so only their aggregate must agree.

    tol_scale > 1 for the contra run: the rebuild deliberately fixes the
    reference's SupCon weight-vs-entry misalignment (image-major vs
    class-major bank append order, NOTES.md), which leaves iteration-0
    losses identical (uniform weights) but perturbs the sim gradients from
    the first update on."""
    for it in range(tight_iters):
        r, o = ref_curves[it], our_curves[it]
        for k in keys:
            rv, ov = r[k], o[k]
            tol = tol_scale * (2e-3 + 2e-3 * it + 0.02 * abs(rv))
            assert abs(rv - ov) < max(tol, 5e-3 * tol_scale), (
                label, it, k, rv, ov)
    # statistical tail: per-term mean absolute deviation bounded relative
    # to the term's mean magnitude over the same window
    if len(ref_curves) <= tight_iters:
        return  # tight-window-only run (the fast-tier guard)
    for k in keys:
        rv = np.array([r[k] for r in ref_curves[tight_iters:]])
        ov = np.array([o[k] for o in our_curves[tight_iters:]])
        # 0.1 floor: several refinement-CE terms sit at 0.01-0.08, where
        # post-flip absolute deviations of ~0.01 are noise, not signal
        scale = max(np.abs(rv).mean(), 0.1)
        mad = np.abs(rv - ov).mean() / scale
        assert mad < 0.25, (label, k, mad, rv[:5], ov[:5])


def test_trajectory_parity_noncontra(tmp_path):
    rng = np.random.RandomState(42)
    batches = _make_data(rng)
    ckpt = str(tmp_path / "init.pth")
    ref = _run_reference(False, 0.0, batches, ckpt)
    ours = _run_rebuild(False, 0.0, batches, ckpt)
    keys = [k for k in ref[0] if k.startswith("loss")]
    assert {"loss_img", "loss_ref_cls0", "loss_ref_reg0"} <= set(keys)
    _compare(ref, ours, keys, "noncontra")
    # optimization moved: total loss at the end differs from the start
    tot0 = sum(ref[0][k] for k in keys)
    totN = sum(ref[-1][k] for k in keys)
    assert abs(totN - tot0) > 1e-4


def test_trajectory_parity_contra(tmp_path):
    rng = np.random.RandomState(43)
    batches = _make_data(rng)
    ckpt = str(tmp_path / "init_contra.pth")
    ref = _run_reference(True, 0.03, batches, ckpt)
    ours = _run_rebuild(True, 0.03, batches, ckpt)
    keys = [k for k in ref[0] if k.startswith("loss")]
    assert "loss_sim" in keys
    # shorter tight window + 3x envelope: the SupCon alignment fix (see
    # _compare docstring) adds a small per-step gradient deviation, and
    # the contra miner has far more discrete decisions per iteration
    _compare(ref, ours, keys, "contra", tight_iters=8, tol_scale=3.0)
