from .vgg16 import VGGBackbone, VGGRoINeck, VGG_CFGS
from .resnet import ResNetBackbone, ResNetRoINeck, FrozenBatchNorm
from .cdb import ConvConcreteDB, gumbel_softmax
from .sim_net import SimNet
from .predictors import WSDDNPredictor, OICRPredictor, MISTPredictor, PREDICTORS
from .detector import WSODDetector, Batch, detector_from_cfg
from .fpn import FPN, ResNetFPNBackbone, ResNetFPNP3P7Backbone
from .fbnet import FBNetTrunk
from .retinanet import RetinaNetHead
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
    "RetinaNetHead", "MaskHead", "Masker", "KeypointHead",
    "CombinedROIHeads", "FastRCNNPredictor",
]
