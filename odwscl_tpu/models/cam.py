"""CAM (class-activation-map) image-level loss + attention logits.

Reference: wetectron/modeling/cam/cam.py:6-47 (Compute_Cam_Loss): a 1x1 conv
over the backbone features produces per-class activation maps; global
average pooling gives image-level logits trained with BCE, and the maps
serve as attention for the CAM-based proposal generator (the reference's
hacked RPN, modeling/rpn/rpn.py:184-190). Instantiated only when `use_cam`
(hardcoded False in generalized_rcnn.py:53) — provided for surface parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.losses import binary_cross_entropy

_KAIMING_OUT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class CAMModule(nn.Module):
    num_classes: int = 21  # incl. background column (ignored in the loss)
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, features: jnp.ndarray, labels_img=None):
        """features [B, H, W, C] -> (cam_maps [B, H, W, C_cls], loss or None).

        labels_img: [B, C_cls] multi-hot with col 0 = background (unused).
        """
        cam = nn.Conv(self.num_classes, (1, 1), dtype=self.compute_dtype,
                      param_dtype=jnp.float32, kernel_init=_KAIMING_OUT,
                      name="cam_conv")(features.astype(self.compute_dtype))
        logits = jnp.mean(cam.astype(jnp.float32), axis=(1, 2))  # GAP
        if labels_img is None:
            return cam, None
        probs = jax.nn.sigmoid(logits[:, 1:])
        loss = binary_cross_entropy(probs, jnp.clip(labels_img[:, 1:], 0, 1))
        return cam, loss.mean()


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
