"""Weight importers: torch VGG16 .pth and detectron .pkl round-trips.

Builds synthetic torch state dicts / caffe2 blobs with the reference's key
naming, imports them, and checks the imported model computes the same
function as a torch reference for the fc6 flatten-order permutation."""

import os
import pickle
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

# golden eval-path import tests run ~minutes on cpu (pytest -m slow; see pytest.ini)
pytestmark = pytest.mark.slow

from odwscl_tpu.models import WSODDetector, Batch
from odwscl_tpu.utils.weight_import import (import_vgg16_imagenet,
                                            import_reference_checkpoint,
                                            import_detectron_resnet,
                                            _TV_VGG16_CONV_IDX)


def _init_params(model, batch):
    variables = jax.jit(lambda r, b: model.init(r, b, method="init_all"))(
        {"params": jax.random.PRNGKey(0)}, batch)
    return jax.device_get(variables["params"])


def _tiny_batch(p=4, hw=64, c=21):
    rng = np.random.RandomState(0)
    return Batch(jnp.array(rng.randn(1, hw, hw, 3), jnp.float32),
                 jnp.full((1, 2), float(hw)),
                 jnp.array([[[0, 0, 40, 40]] * p], jnp.float32),
                 jnp.ones((1, p), bool), jnp.zeros((1, c), jnp.float32))


def test_vgg16_imagenet_import_and_fc6_permutation():
    rng = np.random.RandomState(0)
    sd = {}
    in_ch = 3
    for i, tv in enumerate(_TV_VGG16_CONV_IDX):
        out_ch = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512][i]
        sd[f"features.{tv}.weight"] = torch.tensor(
            rng.randn(out_ch, in_ch, 3, 3).astype(np.float32))
        sd[f"features.{tv}.bias"] = torch.tensor(
            rng.randn(out_ch).astype(np.float32))
        in_ch = out_ch
    w6 = rng.randn(4096, 512 * 7 * 7).astype(np.float32)
    sd["classifier.0.weight"] = torch.tensor(w6)
    sd["classifier.0.bias"] = torch.tensor(rng.randn(4096).astype(np.float32))
    sd["classifier.3.weight"] = torch.tensor(
        rng.randn(4096, 4096).astype(np.float32))
    sd["classifier.3.bias"] = torch.tensor(rng.randn(4096).astype(np.float32))

    model = WSODDetector(compute_dtype="float32")
    params = _init_params(model, _tiny_batch())
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "vgg16.pth")
        torch.save(sd, path)
        params = import_vgg16_imagenet(params, path)

    # conv weights transposed to [kh, kw, in, out]
    np.testing.assert_allclose(
        params["backbone"]["conv0"]["kernel"],
        sd["features.0.weight"].numpy().transpose(2, 3, 1, 0))

    # fc6 permutation: torch flattens pooled feats as (C, h, w); ours (h, w, C)
    pooled = rng.randn(7, 7, 512).astype(np.float32)  # our (h, w, C)
    ours = pooled.reshape(-1) @ params["neck"]["fc6"]["kernel"]
    torch_in = pooled.transpose(2, 0, 1).reshape(-1)  # (C, h, w) flatten
    theirs = w6 @ torch_in
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)


def test_reference_checkpoint_import_covers_all_heads():
    rng = np.random.RandomState(1)
    model = WSODDetector(compute_dtype="float32", mlp_dim=4096)
    params = _init_params(model, _tiny_batch())
    sd = {}
    # backbone: VGG16-OICR sequential indices
    seq_idx, idx = [], 0
    for v in [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "I", "512-D", "512-D", "512-D"]:
        if v in ("M", "I"):
            idx += 1
        else:
            seq_idx.append(idx)
            idx += 2
    shapes = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    in_ch = 3
    for i, si in enumerate(seq_idx):
        sd[f"backbone.body.features.{si}.weight"] = torch.tensor(
            rng.randn(shapes[i], in_ch, 3, 3).astype(np.float32))
        sd[f"backbone.body.features.{si}.bias"] = torch.tensor(
            rng.randn(shapes[i]).astype(np.float32))
        in_ch = shapes[i]
    sd["roi_heads.feature_extractor.classifier.1.weight"] = torch.tensor(
        rng.randn(4096, 25088).astype(np.float32))
    sd["roi_heads.feature_extractor.classifier.1.bias"] = torch.tensor(
        rng.randn(4096).astype(np.float32))
    sd["roi_heads.feature_extractor.classifier.4.weight"] = torch.tensor(
        rng.randn(4096, 4096).astype(np.float32))
    sd["roi_heads.feature_extractor.classifier.4.bias"] = torch.tensor(
        rng.randn(4096).astype(np.float32))
    sd["roi_heads.model_sim.mlp.0.weight"] = torch.tensor(
        rng.randn(4096, 4096).astype(np.float32))
    sd["roi_heads.model_sim.mlp.0.bias"] = torch.tensor(
        rng.randn(4096).astype(np.float32))
    sd["roi_heads.model_sim.mlp.2.weight"] = torch.tensor(
        rng.randn(128, 4096).astype(np.float32))
    sd["roi_heads.model_sim.mlp.2.bias"] = torch.tensor(
        rng.randn(128).astype(np.float32))
    for head, dim in [("cls_score", 21), ("det_score", 21), ("ref1", 21),
                      ("ref2", 21), ("ref3", 21), ("bbox_pred1", 84),
                      ("bbox_pred2", 84), ("bbox_pred3", 84)]:
        sd[f"roi_heads.predictor.{head}.weight"] = torch.tensor(
            rng.randn(dim, 4096).astype(np.float32))
        sd[f"roi_heads.predictor.{head}.bias"] = torch.tensor(
            rng.randn(dim).astype(np.float32))

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "model_final.pth")
        torch.save({"model": sd}, path)
        params = import_reference_checkpoint(params, path)

    np.testing.assert_allclose(
        params["pred"]["ref2"]["linear"]["kernel"],
        sd["roi_heads.predictor.ref2.weight"].numpy().T)
    np.testing.assert_allclose(
        params["sim_net"]["mlp1"]["kernel"],
        sd["roi_heads.model_sim.mlp.2.weight"].numpy().T)
    # conv12 (the last dilated conv5_3) sits at sequential index 28
    np.testing.assert_allclose(
        params["backbone"]["conv12"]["kernel"],
        sd["backbone.body.features.28.weight"].numpy().transpose(2, 3, 1, 0))


def test_detectron_pkl_resnet_import():
    rng = np.random.RandomState(2)
    model = WSODDetector(backbone_arch="R-50-C5", compute_dtype="float32",
                         pooler_scale=0.0625)
    params = _init_params(model, _tiny_batch())
    blobs = {"conv1_w": rng.randn(64, 3, 7, 7).astype(np.float32),
             "res_conv1_bn_s": rng.randn(64).astype(np.float32),
             "res_conv1_bn_b": rng.randn(64).astype(np.float32)}
    # one block of res2 for the smoke check
    blobs["res2_0_branch2a_w"] = rng.randn(64, 64, 1, 1).astype(np.float32)
    blobs["res2_0_branch2a_bn_s"] = rng.randn(64).astype(np.float32)
    blobs["res2_0_branch2a_bn_b"] = rng.randn(64).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "R-50.pkl")
        with open(path, "wb") as f:
            pickle.dump({"blobs": blobs}, f)
        params = import_detectron_resnet(params, path)
    np.testing.assert_allclose(
        params["backbone"]["stem_conv"]["kernel"],
        blobs["conv1_w"].transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        params["backbone"]["layer1_0"]["conv1"]["kernel"],
        blobs["res2_0_branch2a_w"].transpose(2, 3, 1, 0))
    np.testing.assert_allclose(params["backbone"]["stem_bn"]["scale"],
                               blobs["res_conv1_bn_s"])
