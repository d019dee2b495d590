"""ops/device_resize.py — the TPU.EVAL_DEVICE_RESIZE TTA serving fast path.

The device resampler must reproduce PIL.Image.resize(BILINEAR) semantics
(the host path, data/transforms.py resize() via EvalTransform):
  - float parity: against PIL 'F'-mode resize (no uint8 rounding) the
    matmul kernel matches to float tolerance, for magnification AND
    antialiased minification;
  - host-path bound: against the real uint8 PIL path the deviation is
    bounded by uint8 rounding (~1 BGR-255 unit per pixel);
  - padded canvases stay zero outside each image's target region;
  - box scaling is bit-parity with the host resize();
  - Inferencer.predict_samples(TPU.EVAL_DEVICE_RESIZE=True) merges to the
    same detections as the host-PIL TTA path (toy model, loose tol only
    on image-content-driven scores).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from odwscl_tpu.ops.device_resize import (resize_image_batch,
                                          scale_boxes_batch,
                                          triangle_weights)


def _pil_resize_float(img_hwc: np.ndarray, th: int, tw: int) -> np.ndarray:
    """PIL 'F'-mode per-channel resize — the float-exact triangle filter."""
    chans = []
    for c in range(img_hwc.shape[-1]):
        im = Image.fromarray(img_hwc[..., c].astype(np.float32), mode="F")
        chans.append(np.asarray(im.resize((tw, th), Image.BILINEAR)))
    return np.stack(chans, -1)


@pytest.mark.parametrize("shape,target", [
    ((40, 56), (80, 112)),     # 2x magnification
    ((40, 56), (60, 84)),      # 1.5x
    ((40, 56), (20, 28)),      # 2x minification (antialiased path)
    ((48, 32), (13, 9)),       # non-integer ratio minification
    ((40, 56), (40, 56)),      # identity
])
def test_matches_pil_float_mode(shape, target):
    rng = np.random.RandomState(0)
    h, w = shape
    th, tw = target
    img = rng.uniform(-128, 128, (h, w, 3)).astype(np.float32)
    want = _pil_resize_float(img, th, tw)
    got = np.asarray(resize_image_batch(
        jnp.asarray(img)[None], jnp.array([[h, w]], jnp.float32),
        jnp.array([[th, tw]], jnp.float32), (th, tw)))[0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-3)


def test_uint8_host_path_bound():
    """Device path (normalize then resize, f32) vs host path (uint8 PIL
    resize then normalize): within uint8 rounding of each other."""
    rng = np.random.RandomState(1)
    h, w, th, tw = 50, 66, 80, 106
    raw = rng.randint(0, 256, (h, w, 3), np.uint8)
    mean = np.array([102.98, 115.95, 122.77], np.float32)
    # host: PIL uint8 resize -> /255 -> bgr255 -> mean-subtract
    host = np.asarray(Image.fromarray(raw).resize((tw, th), Image.BILINEAR),
                      np.float32) / 255.0
    host = host[..., ::-1] * 255.0 - mean
    # device: normalize at original size -> matmul resize
    base = (raw.astype(np.float32) / 255.0)[..., ::-1] * 255.0 - mean
    dev = np.asarray(resize_image_batch(
        jnp.asarray(base)[None], jnp.array([[h, w]], jnp.float32),
        jnp.array([[th, tw]], jnp.float32), (th, tw)))[0]
    assert np.abs(dev - host).max() <= 1.01
    assert np.abs(dev - host).mean() <= 0.35


def test_padding_stays_zero_and_valid_region_matches():
    """Padded source + padded canvas: the valid region equals the unpadded
    resize; everything outside each image's target extent is zero."""
    rng = np.random.RandomState(2)
    h0, w0 = 40, 56
    img = rng.uniform(-50, 50, (h0, w0, 3)).astype(np.float32)
    padded = np.zeros((64, 64, 3), np.float32)
    padded[:h0, :w0] = img
    th, tw = 30, 42
    out = np.asarray(resize_image_batch(
        jnp.asarray(padded)[None], jnp.array([[h0, w0]], jnp.float32),
        jnp.array([[th, tw]], jnp.float32), (64, 64)))[0]
    ref = np.asarray(resize_image_batch(
        jnp.asarray(img)[None], jnp.array([[h0, w0]], jnp.float32),
        jnp.array([[th, tw]], jnp.float32), (th, tw)))[0]
    np.testing.assert_allclose(out[:th, :tw], ref, rtol=1e-5, atol=1e-5)
    assert np.all(out[th:] == 0.0)
    assert np.all(out[:, tw:] == 0.0)


def test_weights_rows_sum_to_one_in_valid_region():
    w = np.asarray(triangle_weights(32, 48, 41.0, 23.0))
    np.testing.assert_allclose(w[:23].sum(1), 1.0, atol=1e-5)
    assert np.all(w[23:] == 0.0)
    assert np.all(w[:, 41:] == 0.0)


def test_scale_boxes_matches_host_resize():
    from odwscl_tpu.data.transforms import Sample, resize
    rng = np.random.RandomState(3)
    w, h = 56, 40
    rois = np.concatenate([rng.uniform(0, w / 2, (9, 1)),
                           rng.uniform(0, h / 2, (9, 1)),
                           rng.uniform(w / 2, w - 1, (9, 1)),
                           rng.uniform(h / 2, h - 1, (9, 1))],
                          1).astype(np.float32)
    img = Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8))
    s = Sample(image=img, size=(w, h), rois=rois)
    s2 = resize(s, 64, 128)
    tw, th = s2.size
    got = np.asarray(scale_boxes_batch(
        jnp.asarray(rois)[None], jnp.array([[h, w]], jnp.float32),
        jnp.array([[th, tw]], jnp.float32)))[0]
    np.testing.assert_allclose(got, s2.rois, rtol=1e-5)


def test_device_resize_predict_matches_host_path(monkeypatch):
    from tests.test_eval_pipeline import _ToyModel, _samples, _tta_cfg
    from odwscl_tpu.engine.inference import Inferencer

    samples = _samples()
    captured = {}
    orig = Inferencer._finalize

    def capture(self, scores, boxes, mask):
        captured["scores"] = np.asarray(scores, np.float32)
        captured["boxes"] = np.asarray(boxes, np.float32)
        return orig(self, scores, boxes, mask)

    monkeypatch.setattr(Inferencer, "_finalize", capture)

    outs = {}
    for mode in ("host", "device"):
        cfg = _tta_cfg()
        ov = ["TPU.EVAL_TRANSFER_BF16", "False"]
        if mode == "device":
            ov += ["TPU.EVAL_DEVICE_RESIZE", "True"]
        cfg.merge_from_list(ov)
        cfg.freeze()
        inf = Inferencer(_ToyModel(), {}, cfg)
        inf._fwd = lambda v, b: inf.model.apply(v, b, train=False)
        inf.predict_samples(samples)
        outs[mode] = (captured["scores"].copy(), captured["boxes"].copy())

    # proposals scale identically in both paths -> boxes near-exact; scores
    # depend on resampled pixels (ToyModel pools the image) -> loose tol
    np.testing.assert_allclose(outs["device"][1], outs["host"][1],
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(outs["device"][0], outs["host"][0],
                               rtol=0.05, atol=5e-3)
