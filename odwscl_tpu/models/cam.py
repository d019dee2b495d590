"""CAM (class-activation-map) image-level loss + attention logits.

Reference: wetectron/modeling/cam/cam.py:6-47 (Compute_Cam_Loss): a 1x1 conv
over the backbone features produces per-class activation maps; global
average pooling gives image-level logits trained with BCE, and the maps
serve as attention for the CAM-based proposal generator (the reference's
hacked RPN, modeling/rpn/rpn.py:184-190). Instantiated only when `use_cam`
(hardcoded False in generalized_rcnn.py:53) — provided for surface parity.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

class CAMModule(nn.Module):
    num_classes: int = 21  # incl. background column

    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, features: jnp.ndarray, labels_img=None):
        """features [B, H, W, C] -> (atten_logits [B, H, W, C_cls], loss).

        Matches Compute_Cam_Loss (cam.py:20-47): the image-level logits are
        GAP(features) @ W + b trained with BCE-with-logits over ALL class
        columns (col 0 forced to 0 by generate_img_label, utils.py:53-57);
        the returned attention logits are the SAME weights applied as a
        1x1 conv WITHOUT bias (cam.py:38, conv2d(..., bias=None)). Weight
        init N(0, 0.01), bias 0 (cam.py:14-18).

        labels_img: [B, C_cls] multi-hot; col 0 is zeroed internally.
        """
        kernel = self.param("cam_conv_kernel", nn.initializers.normal(0.01),
                            (features.shape[-1], self.num_classes),
                            jnp.float32)
        bias = self.param("cam_conv_bias", nn.initializers.zeros,
                          (self.num_classes,), jnp.float32)
        k = kernel.astype(self.compute_dtype)
        atten = features.astype(self.compute_dtype) @ k    # 1x1 conv, no bias
        if labels_img is None:
            return atten, None
        gap = jnp.mean(features.astype(jnp.float32), axis=(1, 2))  # [B, C]
        logits = gap @ kernel + bias
        tgt = jnp.clip(labels_img, 0, 1).at[:, 0].set(0.0)
        # BCE with logits (stable): max(x,0) - x*t + log1p(exp(-|x|))
        bce = (jnp.maximum(logits, 0) - logits * tgt
               + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        return atten, bce.mean()


def cam_proposals(cam: jnp.ndarray, labels_img: jnp.ndarray,
                  num_boxes: int = 128, threshold: float = 0.5):
    """CAM-attention proposal scores (the reference RPN hack returns
    objectness pooled from attention maps, rpn.py:184-190): per present
    class, threshold the normalized map and return per-cell objectness that
    a host-side connected-component pass can turn into boxes."""
    maps = cam.astype(jnp.float32)
    lo = maps.min(axis=(1, 2), keepdims=True)
    hi = maps.max(axis=(1, 2), keepdims=True)
    norm = (maps - lo) / jnp.clip(hi - lo, 1e-6)
    present = labels_img[:, None, None, :] > 0
    objectness = jnp.max(jnp.where(present, norm, 0.0), axis=-1)  # [B, H, W]
    return objectness, objectness >= threshold
