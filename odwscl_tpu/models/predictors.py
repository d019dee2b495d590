"""Weak-detection predictor heads.

Reference: wetectron/modeling/roi_heads/weak_head/roi_weak_predictors.py.
All heads are Linear(4096, .) initialized N(0, 0.001), bias 0
(roi_weak_predictors.py:136-140). The eval-mode softmaxes the reference
applies *inside* the predictor (:167-179) are done here with explicit
proposal masks (padding excluded from the per-image det softmax).

Batched layout: features [B, P, D]; the reference's flat [sum(P_i), D] +
`.split(...)` bookkeeping disappears because shapes are static.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

_HEAD_INIT = nn.initializers.normal(0.001)


def _softmax_p(logits: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Softmax along the proposal axis P with padding excluded; pads get 0."""
    neg = jnp.asarray(-jnp.inf, jnp.float32)
    masked = jnp.where(mask[..., None], logits.astype(jnp.float32), neg)
    m = jnp.max(masked, axis=-2, keepdims=True)
    e = jnp.where(mask[..., None], jnp.exp(masked - m), 0.0)
    return e / jnp.clip(e.sum(axis=-2, keepdims=True), 1e-20)


def _softmax_c(logits: jnp.ndarray) -> jnp.ndarray:
    return nn.softmax(logits.astype(jnp.float32), axis=-1)


class _Linear(nn.Module):
    features: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.features, dtype=self.compute_dtype,
                        param_dtype=jnp.float32, kernel_init=_HEAD_INIT,
                        name="linear")(x)


class WSDDNPredictor(nn.Module):
    """cls + det linear pair (roi_weak_predictors.py:12-52)."""

    num_classes: int = 21
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool = True):
        cls_logit = _Linear(self.num_classes, self.compute_dtype, name="cls_score")(x)
        det_logit = _Linear(self.num_classes, self.compute_dtype, name="det_score")(x)
        if not train:
            cls_logit = _softmax_c(cls_logit)
            det_logit = _softmax_p(det_logit, mask)
        return cls_logit, det_logit, None, None


class OICRPredictor(nn.Module):
    """cls/det + 3 refinement branches (roi_weak_predictors.py:55-109)."""

    num_classes: int = 21
    num_refs: int = 3
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool = True):
        cls_logit = _Linear(self.num_classes, self.compute_dtype, name="cls_score")(x)
        det_logit = _Linear(self.num_classes, self.compute_dtype, name="det_score")(x)
        refs = [_Linear(self.num_classes, self.compute_dtype, name=f"ref{i+1}")(x)
                for i in range(self.num_refs)]
        if not train:
            cls_logit = _softmax_c(cls_logit)
            det_logit = _softmax_p(det_logit, mask)
            refs = [_softmax_c(r) for r in refs]
        return cls_logit, det_logit, refs, None


class MISTPredictor(nn.Module):
    """cls/det + 3 refinement branches each with 4*C box deltas
    (roi_weak_predictors.py:112-187). The default WSOD predictor."""

    num_classes: int = 21
    num_refs: int = 3
    cls_agnostic_bbox_reg: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, List[jnp.ndarray],
                            List[jnp.ndarray]]:
        num_bbox_classes = 2 if self.cls_agnostic_bbox_reg else self.num_classes
        cls_logit = _Linear(self.num_classes, self.compute_dtype, name="cls_score")(x)
        det_logit = _Linear(self.num_classes, self.compute_dtype, name="det_score")(x)
        refs, bbox_preds = [], []
        for i in range(self.num_refs):
            refs.append(_Linear(self.num_classes, self.compute_dtype,
                                name=f"ref{i+1}")(x))
            bbox_preds.append(_Linear(num_bbox_classes * 4, self.compute_dtype,
                                      name=f"bbox_pred{i+1}")(x))
        if not train:
            cls_logit = _softmax_c(cls_logit)
            det_logit = _softmax_p(det_logit, mask)
            refs = [_softmax_c(r) for r in refs]
        return cls_logit, det_logit, refs, bbox_preds


PREDICTORS = {
    "WSDDNPredictor": WSDDNPredictor,
    "OICRPredictor": OICRPredictor,
    "MISTPredictor": MISTPredictor,
}
