"""Torch/Caffe2 weight importers.

Reference load path: utils/checkpoint.py:126-178 + model_serialization.py:13
(suffix-matching state-dict alignment) + c2_model_loading.py:208 (Caffe2 pkl
ResNets). Here the mappings are explicit instead of suffix-matched:

- torchvision-style VGG16 ImageNet ``.pth`` (catalog
  VGGImageNetPretrained/JCJOHNS/VGG-16) -> backbone convs + fc6/fc7
- a trained reference OD-WSCL checkpoint ``.pth`` -> the full WSODDetector
  param tree (for eval-parity against reference checkpoints)

Layout conversions: torch conv [O,I,kh,kw] -> flax [kh,kw,I,O]; torch linear
[O,I] -> flax [I,O]; fc6 additionally permutes its input from the
reference's (C,7,7) flatten order to this framework's (7,7,C).
"""

from __future__ import annotations

import logging
from typing import Dict

import numpy as np

logger = logging.getLogger("odwscl_tpu.weights")

# torchvision VGG16 `features` conv indices, in order conv0..conv12
_TV_VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def _load_torch(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj:
        obj = obj["model"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k.replace("module.", ""): v.numpy() for k, v in obj.items()
            if hasattr(v, "numpy")}


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _fc6(w: np.ndarray, channels: int = 512, res: int = 7) -> np.ndarray:
    """[4096, C*r*r] with (C,h,w) input order -> [r*r*C (h,w,C) order, 4096]."""
    o = w.shape[0]
    w = w.reshape(o, channels, res, res).transpose(0, 2, 3, 1).reshape(o, -1)
    return np.transpose(w, (1, 0))


def _set(params, path, value):
    node = params
    for k in path[:-1]:
        node = node[k]
    old = node[path[-1]]
    if tuple(old.shape) != tuple(value.shape):
        raise ValueError(f"shape mismatch at {path}: {old.shape} vs {value.shape}")
    node[path[-1]] = value.astype(np.float32)


def import_vgg16_imagenet(params, path: str):
    """Load a torchvision/JCJOHNS VGG16 ImageNet .pth into backbone + neck.

    Matches the reference warm start (configs `WEIGHT:
    catalog://VGGImageNetPretrained/JCJOHNS/VGG-16`): conv1_1..conv5_3 and
    the two classifier FCs (fc6/fc7).
    """
    import jax
    sd = _load_torch(path)
    params = jax.tree_util.tree_map(np.asarray, params)
    prefix = "features."
    # some checkpoints use classifier.1/classifier.4 (reference extractor) or
    # classifier.0/classifier.3 (torchvision)
    fc_keys = [("classifier.0", "classifier.3"), ("classifier.1", "classifier.4")]
    loaded = 0
    for i, tv in enumerate(_TV_VGG16_CONV_IDX):
        wk, bk = f"{prefix}{tv}.weight", f"{prefix}{tv}.bias"
        if wk in sd:
            _set(params, ("backbone", f"conv{i}", "kernel"), _conv(sd[wk]))
            _set(params, ("backbone", f"conv{i}", "bias"), sd[bk])
            loaded += 1
    for fc6k, fc7k in fc_keys:
        if f"{fc6k}.weight" in sd:
            _set(params, ("neck", "fc6", "kernel"), _fc6(sd[f"{fc6k}.weight"]))
            _set(params, ("neck", "fc6", "bias"), sd[f"{fc6k}.bias"])
            _set(params, ("neck", "fc7", "kernel"), _linear(sd[f"{fc7k}.weight"]))
            _set(params, ("neck", "fc7", "bias"), sd[f"{fc7k}.bias"])
            loaded += 2
            break
    logger.info("Imported %d VGG16 layers from %s", loaded, path)
    if loaded < len(_TV_VGG16_CONV_IDX):
        logger.warning("Only %d/%d convs matched", loaded, len(_TV_VGG16_CONV_IDX))
    return params


# reference checkpoint key -> (our param path builder, converter)
_REF_HEAD_MAP = {
    "roi_heads.feature_extractor.classifier.1": (("neck", "fc6"), _fc6),
    "roi_heads.feature_extractor.classifier.4": (("neck", "fc7"), _linear),
    "roi_heads.model_sim.mlp.0": (("sim_net", "mlp0"), _linear),
    "roi_heads.model_sim.mlp.2": (("sim_net", "mlp1"), _linear),
}
_PRED_HEADS = ["cls_score", "det_score", "ref1", "ref2", "ref3",
               "bbox_pred1", "bbox_pred2", "bbox_pred3"]


def import_detectron_resnet(params, path: str):
    """Load a Caffe2 detectron ImageNet ResNet ``.pkl`` into the backbone
    (reference utils/c2_model_loading.py:208 `load_c2_format`).

    Caffe2 naming: conv1_w / res_conv1_bn_{s,b}; res{S}_{B}_branch2{a,b,c}_w
    with fused-affine BN ({s,b} only — means/vars are pre-folded, so our
    FrozenBatchNorm gets mean=0, var=1)."""
    import jax

    with open(path, "rb") as f:
        import pickle

        data = pickle.load(f, encoding="latin1")
    if "blobs" in data:
        data = data["blobs"]
    params = jax.tree_util.tree_map(np.asarray, params)

    def set_bn(prefix_ours, c2name):
        _set(params, ("backbone",) + prefix_ours + ("scale",), data[c2name + "_s"])
        _set(params, ("backbone",) + prefix_ours + ("bias",), data[c2name + "_b"])
        # means/vars folded by detectron conversion

    loaded = 0
    if "conv1_w" in data:
        _set(params, ("backbone", "stem_conv", "kernel"), _conv(data["conv1_w"]))
        set_bn(("stem_bn",), "res_conv1_bn")
        loaded += 1
    branch_map = {"branch2a": ("conv1", "bn1"), "branch2b": ("conv2", "bn2"),
                  "branch2c": ("conv3", "bn3"),
                  "branch1": ("downsample", "downsample_bn")}
    for key in list(data.keys()):
        if not key.startswith("res") or not key.endswith("_w") or key == "conv1_w":
            continue
        parts = key[:-2].split("_")  # e.g. res2_0_branch2a
        if len(parts) != 3 or not parts[0].startswith("res"):
            continue
        stage = int(parts[0][3:]) - 1  # res2 -> layer1
        block = int(parts[1])
        conv_name, bn_name = branch_map[parts[2]]
        base = f"layer{stage}_{block}"
        try:
            _set(params, ("backbone", base, conv_name, "kernel"),
                 _conv(data[key]))
            set_bn((base, bn_name), key[:-2] + "_bn")
            loaded += 1
        except (KeyError, ValueError) as e:
            logger.warning("skip %s: %s", key, e)
    logger.info("Imported %d detectron ResNet tensors from %s", loaded, path)
    return params


def import_reference_checkpoint(params, path: str):
    """Load a trained reference OD-WSCL checkpoint (.pth) into the full
    WSODDetector param tree — backbone, neck, sim net, predictor heads."""
    import jax
    sd = _load_torch(path)
    params = jax.tree_util.tree_map(np.asarray, params)
    loaded = 0
    # VGG16-OICR sequential conv indices (convs + relus + pools + identity);
    # reference backbone keys: backbone.body.features.<seq_idx>.weight,
    # seq indices following make_layers (vgg16.py:58-83)
    seq_idx = []
    idx = 0
    for v in [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "I", "512-D", "512-D", "512-D"]:
        if v == "M" or v == "I":
            idx += 1
        else:
            seq_idx.append(idx)
            idx += 2  # conv + relu (last relu stripped; harmless here)
    for i, si in enumerate(seq_idx):
        wk = f"backbone.body.features.{si}.weight"
        if wk in sd:
            _set(params, ("backbone", f"conv{i}", "kernel"), _conv(sd[wk]))
            _set(params, ("backbone", f"conv{i}", "bias"),
                 sd[f"backbone.body.features.{si}.bias"])
            loaded += 1
    for refk, (path_, conv) in _REF_HEAD_MAP.items():
        wk = f"{refk}.weight"
        if wk in sd:
            _set(params, path_ + ("kernel",), conv(sd[wk]))
            _set(params, path_ + ("bias",), sd[f"{refk}.bias"])
            loaded += 1
    for head in _PRED_HEADS:
        wk = f"roi_heads.predictor.{head}.weight"
        if wk in sd:
            _set(params, ("pred", head, "linear", "kernel"), _linear(sd[wk]))
            _set(params, ("pred", head, "linear", "bias"),
                 sd[f"roi_heads.predictor.{head}.bias"])
            loaded += 1
    logger.info("Imported %d tensors from reference checkpoint %s", loaded, path)
    return params
