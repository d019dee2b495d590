"""Keypoint structures + heatmap projection.

Parity target: wetectron/structures/keypoint.py (213 LoC — Keypoints /
PersonKeypoints / Click / keypoints_to_heat_map). Containers are host
numpy (data pipeline); `keypoints_to_heatmap` is the device-side
projection (pure jnp, jittable — the reference's torch version at
keypoint.py:154-189 translated op-for-op) used by the keypoint-head loss.

The `Click` point-supervision structure is the one member of this family
the WSOD path actually uses; the rebuild's partial-label pipeline carries
clicks as padded arrays (data/coco_dataset.py, models/roi_sampler.py) —
the class here completes the structure-API surface.
"""

from __future__ import annotations

import numpy as np

FLIP_LEFT_RIGHT = 0
FLIP_TOP_BOTTOM = 1


class Keypoints:
    """[N, K, 3] (x, y, visibility) keypoints of one image
    (ref keypoint.py:8-88)."""

    FLIP_INDS: np.ndarray = None  # subclasses define

    def __init__(self, keypoints, size, mode=None):
        kp = np.asarray(keypoints, np.float32)
        if kp.size == 0:
            kp = kp.reshape(0, 0, 3)
        self.keypoints = kp
        self.size = tuple(size)
        self.mode = mode
        self.extra_fields = {}

    def crop(self, box):
        raise NotImplementedError()

    def resize(self, size):
        ratio_w = float(size[0]) / float(self.size[0])
        ratio_h = float(size[1]) / float(self.size[1])
        data = self.keypoints.copy()
        data[..., 0] *= ratio_w
        data[..., 1] *= ratio_h
        out = type(self)(data, size, self.mode)
        out.extra_fields = dict(self.extra_fields)
        return out

    def transpose(self, method):
        if method not in (FLIP_LEFT_RIGHT,):
            raise NotImplementedError("Only FLIP_LEFT_RIGHT implemented")
        flip_inds = type(self).FLIP_INDS
        data = self.keypoints[:, flip_inds].copy()
        data[..., 0] = self.size[0] - data[..., 0] - 1   # TO_REMOVE=1
        # COCO convention: visibility 0 => (x, y) = 0 (ref :53-55)
        data[data[..., 2] == 0] = 0
        out = type(self)(data, self.size, self.mode)
        out.extra_fields = dict(self.extra_fields)
        return out

    def add_field(self, field, data):
        self.extra_fields[field] = data

    def get_field(self, field):
        return self.extra_fields[field]

    def __getitem__(self, item):
        out = type(self)(self.keypoints[item], self.size, self.mode)
        for k, v in self.extra_fields.items():
            out.add_field(k, v[item])
        return out

    def __len__(self):
        return self.keypoints.shape[0]


def _create_flip_indices(names, flip_map):
    full_flip_map = dict(flip_map)
    full_flip_map.update({v: k for k, v in flip_map.items()})
    flipped_names = [full_flip_map.get(n, n) for n in names]
    return np.asarray([names.index(n) for n in flipped_names])


class PersonKeypoints(Keypoints):
    NAMES = [
        "nose", "left_eye", "right_eye", "left_ear", "right_ear",
        "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
        "left_wrist", "right_wrist", "left_hip", "right_hip",
        "left_knee", "right_knee", "left_ankle", "right_ankle",
    ]
    FLIP_MAP = {
        "left_eye": "right_eye", "left_ear": "right_ear",
        "left_shoulder": "right_shoulder", "left_elbow": "right_elbow",
        "left_wrist": "right_wrist", "left_hip": "right_hip",
        "left_knee": "right_knee", "left_ankle": "right_ankle",
    }


PersonKeypoints.FLIP_INDS = _create_flip_indices(PersonKeypoints.NAMES,
                                                 PersonKeypoints.FLIP_MAP)


class Click(Keypoints):
    """Point supervision (x, y, 1) per annotation (ref keypoint.py:191-212)
    — flips do NOT permute indices (clicks are unordered points)."""

    def transpose(self, method):
        if method not in (FLIP_LEFT_RIGHT,):
            raise NotImplementedError("Only FLIP_LEFT_RIGHT implemented")
        data = self.keypoints.copy()
        data[..., 0] = self.size[0] - data[..., 0] - 1
        out = type(self)(data, self.size, self.mode)
        out.extra_fields = dict(self.extra_fields)
        return out


def keypoints_to_heatmap(keypoints, rois, heatmap_size: int):
    """Project [N, K, 3] keypoints into per-roi heatmap bins.

    Pure jnp translation of the reference's keypoints_to_heat_map
    (keypoint.py:154-189): returns (lin_ind [N, K] int32 — flattened
    heatmap index, zeroed where invalid; valid [N, K] int32). Jittable:
    static shapes, no host sync — the keypoint-head loss gathers logits
    at lin_ind under the valid mask.
    """
    import jax.numpy as jnp

    offset_x = rois[:, 0:1]
    offset_y = rois[:, 1:2]
    scale_x = heatmap_size / (rois[:, 2:3] - rois[:, 0:1])
    scale_y = heatmap_size / (rois[:, 3:4] - rois[:, 1:2])

    x = keypoints[..., 0]
    y = keypoints[..., 1]
    x_boundary = x == rois[:, 2:3]
    y_boundary = y == rois[:, 3:4]

    xi = jnp.floor((x - offset_x) * scale_x).astype(jnp.int32)
    yi = jnp.floor((y - offset_y) * scale_y).astype(jnp.int32)
    xi = jnp.where(x_boundary, heatmap_size - 1, xi)
    yi = jnp.where(y_boundary, heatmap_size - 1, yi)

    valid_loc = ((xi >= 0) & (yi >= 0)
                 & (xi < heatmap_size) & (yi < heatmap_size))
    vis = keypoints[..., 2] > 0
    valid = (valid_loc & vis).astype(jnp.int32)
    lin_ind = (yi * heatmap_size + xi) * valid
    return lin_ind, valid
