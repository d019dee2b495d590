from .vgg16 import VGGBackbone, VGGRoINeck, VGG_CFGS
from .resnet import ResNetBackbone, ResNetRoINeck, FrozenBatchNorm
from .cdb import ConvConcreteDB, gumbel_softmax
from .sim_net import SimNet
from .predictors import WSDDNPredictor, OICRPredictor, MISTPredictor, PREDICTORS
from .detector import WSODDetector, Batch, detector_from_cfg

__all__ = [
    "VGGBackbone", "VGGRoINeck", "VGG_CFGS", "SimNet",
    "ResNetBackbone", "ResNetRoINeck", "FrozenBatchNorm",
    "ConvConcreteDB", "gumbel_softmax",
    "WSDDNPredictor", "OICRPredictor", "MISTPredictor", "PREDICTORS",
    "WSODDetector", "Batch", "detector_from_cfg",
]
