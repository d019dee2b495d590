from .vgg16 import VGGBackbone, VGGRoINeck, VGG_CFGS
from .resnet import ResNetBackbone, ResNetRoINeck, FrozenBatchNorm
from .cdb import ConvConcreteDB, gumbel_softmax
from .sim_net import SimNet
from .predictors import WSDDNPredictor, OICRPredictor, MISTPredictor, PREDICTORS
from .detector import WSODDetector, Batch, detector_from_cfg
from .fpn import FPN, ResNetFPNBackbone, ResNetFPNP3P7Backbone
from .fbnet import FBNetTrunk
from .retinanet import RetinaNetHead, RetinaNetDetector, retinanet_from_cfg
from .supervised import SupervisedRCNN, supervised_from_cfg
from .mask_head import MaskHead, Masker
from .keypoint_head import KeypointHead
from .roi_heads import CombinedROIHeads, FastRCNNPredictor

__all__ = [
    "VGGBackbone", "VGGRoINeck", "VGG_CFGS", "SimNet",
    "ResNetBackbone", "ResNetRoINeck", "FrozenBatchNorm",
    "ConvConcreteDB", "gumbel_softmax",
    "WSDDNPredictor", "OICRPredictor", "MISTPredictor", "PREDICTORS",
    "WSODDetector", "Batch", "detector_from_cfg",
    "FPN", "ResNetFPNBackbone", "ResNetFPNP3P7Backbone", "FBNetTrunk",
    "RetinaNetHead", "RetinaNetDetector", "retinanet_from_cfg",
    "SupervisedRCNN", "supervised_from_cfg", "build_model",
    "MaskHead", "Masker", "KeypointHead",
    "CombinedROIHeads", "FastRCNNPredictor",
]


def build_model(cfg):
    """The reference's build_detection_model (modeling/detector/
    detectors.py + roi_heads.py:61-85 WSOD_ON dispatch + backbone.py
    registry): one entry point for every model family.

    MODEL.RETINANET_ON -> RetinaNetDetector (dense single-stage);
    MODEL.WSOD_ON      -> WSODDetector (the flagship weak path);
    otherwise          -> SupervisedRCNN (Fast/Mask/Keypoint R-CNN per
                          MASK_ON / KEYPOINT_ON over any CONV_BODY).
    """
    if cfg.MODEL.RETINANET_ON:
        return retinanet_from_cfg(cfg)
    if cfg.MODEL.WSOD_ON:
        return detector_from_cfg(cfg)
    return supervised_from_cfg(cfg)
