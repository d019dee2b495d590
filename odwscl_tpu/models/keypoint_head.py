"""Keypoint R-CNN head: conv tower + deconv heatmap predictor + loss +
heatmap decoding.

Parity target: wetectron/modeling/roi_heads/keypoint_head/ (~550 LoC —
keypoint_head.py, roi_keypoint_feature_extractors.py,
roi_keypoint_predictors.py, loss.py, inference.py). Dead in every shipped
WSOD config (roi_heads.py:68); ported for framework completeness.

TPU-first: the head is a pure [N, r, r, C] -> [N, H, H, K] map; matching
and target projection are batched/masked (structures/keypoints.py
keypoints_to_heatmap is the jittable projection); the loss is a masked
cross-entropy replacing the reference's nonzero-index gathers
(loss.py:145-170). heatmaps_to_keypoints decoding is host-side eval
post-processing (numpy + cv2, Heckbert d+0.5 convention preserved).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_KAIMING_OUT = nn.initializers.variance_scaling(2.0, "fan_out",
                                                "truncated_normal")


class KeypointFeatureExtractor(nn.Module):
    """KeypointRCNNFeatureExtractor's conv tower
    (roi_keypoint_feature_extractors.py:11-43): 8x conv3x3(512)+ReLU."""

    conv_layers: tuple = tuple(512 for _ in range(8))
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.compute_dtype)
        for i, ch in enumerate(self.conv_layers, 1):
            x = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.compute_dtype, param_dtype=jnp.float32,
                        kernel_init=_KAIMING_OUT, name=f"conv_fcn{i}")(x)
            x = nn.relu(x)
        return x


class KeypointPredictor(nn.Module):
    """KeypointRCNNPredictor (roi_keypoint_predictors.py:7-33): 4x4 s2
    deconv to K channels + bilinear 2x upsample -> [N, 4r, 4r, K]."""

    num_keypoints: int = 17
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        # torch ConvTranspose2d(k=4, s=2, p=1) doubles the resolution;
        # flax's SAME padding is the equivalent output geometry
        x = nn.ConvTranspose(self.num_keypoints, (4, 4), strides=(2, 2),
                             padding="SAME",
                             dtype=self.compute_dtype,
                             param_dtype=jnp.float32,
                             kernel_init=_KAIMING_OUT,
                             name="kps_score_lowres")(
            x.astype(self.compute_dtype))
        n, h, w, k = x.shape
        # align_corners=False bilinear x2 (layers.interpolate)
        x = jax.image.resize(x.astype(jnp.float32), (n, 2 * h, 2 * w, k),
                             method="linear")
        return x


class KeypointHead(nn.Module):
    """extractor + predictor (ROIKeypointHead's compute; pooling/matching
    live in the caller)."""

    num_keypoints: int = 17
    conv_layers: tuple = tuple(512 for _ in range(8))
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pooled: jnp.ndarray) -> jnp.ndarray:
        x = KeypointFeatureExtractor(self.conv_layers, self.compute_dtype,
                                     name="extractor")(pooled)
        return KeypointPredictor(self.num_keypoints, self.compute_dtype,
                                 name="predictor")(x)


def keypoint_rcnn_loss(kp_logits: jnp.ndarray, heatmap_targets: jnp.ndarray,
                       valid: jnp.ndarray) -> jnp.ndarray:
    """Cross-entropy over heatmap cells at the valid keypoints
    (ref loss.py:145-170, F.cross_entropy mean over valid entries).

    kp_logits [N, H, H, K] f32; heatmap_targets [N, K] int (flattened cell
    index, from structures.keypoints.keypoints_to_heatmap); valid [N, K]
    {0,1}. Masked: the reference's `keypoint_logits.sum() * 0` empty case
    falls out of the clipped denominator.
    """
    n, h, w, k = kp_logits.shape
    logits = kp_logits.transpose(0, 3, 1, 2).reshape(n * k, h * w)
    targets = heatmap_targets.reshape(n * k)
    v = valid.reshape(n * k).astype(jnp.float32)
    logz = jnp.log(jnp.sum(jnp.exp(
        logits - logits.max(axis=1, keepdims=True)), axis=1)) \
        + logits.max(axis=1, keepdims=False)
    picked = logits[jnp.arange(n * k), jnp.clip(targets, 0)]
    ce = logz - picked
    return (ce * v).sum() / jnp.maximum(v.sum(), 1.0)


def heatmaps_to_keypoints(maps: np.ndarray, rois: np.ndarray):
    """Decode heatmaps to keypoints (ref inference.py:40-98; Heckbert
    d+0.5). maps [N, H, H, K] f32, rois [N, 4] ->
    (xy_preds [N, K, 3], scores [N, K])."""
    import cv2

    offset_x, offset_y = rois[:, 0], rois[:, 1]
    widths = np.maximum(rois[:, 2] - rois[:, 0], 1)
    heights = np.maximum(rois[:, 3] - rois[:, 1], 1)
    widths_ceil = np.ceil(widths).astype(int)
    heights_ceil = np.ceil(heights).astype(int)

    k = maps.shape[3]
    xy_preds = np.zeros((len(rois), 3, k), np.float32)
    scores = np.zeros((len(rois), k), np.float32)
    for i in range(len(rois)):
        rw, rh = int(widths_ceil[i]), int(heights_ceil[i])
        wc = widths[i] / rw
        hc = heights[i] / rh
        roi_map = cv2.resize(maps[i], (rw, rh),
                             interpolation=cv2.INTER_CUBIC)
        if roi_map.ndim == 2:
            roi_map = roi_map[:, :, None]
        roi_map = np.transpose(roi_map, [2, 0, 1])          # [K, rh, rw]
        w = roi_map.shape[2]
        pos = roi_map.reshape(k, -1).argmax(axis=1)
        x_int = pos % w
        y_int = (pos - x_int) // w
        xy_preds[i, 0] = (x_int + 0.5) * wc + offset_x[i]
        xy_preds[i, 1] = (y_int + 0.5) * hc + offset_y[i]
        xy_preds[i, 2] = 1
        scores[i] = roi_map[np.arange(k), y_int, x_int]
    return np.transpose(xy_preds, [0, 2, 1]), scores
