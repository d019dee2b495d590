from .nms import nms_mask, batched_nms_mask, nms_numpy
from .roi_pool import roi_pool, roi_pool_numpy
from .roi_align import roi_align
from .losses import (smooth_l1_loss, sigmoid_focal_loss, binary_cross_entropy,
                     cross_entropy_with_logits)
from .dropblock import dropblock_2d, noise_augment
from .deform_conv import (deform_conv2d, modulated_deform_conv2d,
                          deform_psroi_pooling)

__all__ = [
    "nms_mask", "batched_nms_mask", "nms_numpy",
    "roi_pool", "roi_pool_numpy", "roi_align",
    "smooth_l1_loss", "sigmoid_focal_loss", "binary_cross_entropy",
    "cross_entropy_with_logits", "dropblock_2d", "noise_augment",
    "deform_conv2d", "modulated_deform_conv2d", "deform_psroi_pooling",
]
