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


class _KB(nn.Module):
    """Declares a Dense-shaped (kernel, bias) pair without applying it —
    lets the predictor fuse every head into ONE matmul (8 separate
    [N, 4096] x [4096, ~21] matmuls re-read the activation 8x and idle
    the MXU lanes; fused it is a single [4096, 357] GEMM). The param tree
    (head_name/linear/{kernel,bias}) is identical to _Linear, so
    checkpoints and the torch weight importer are unaffected."""

    features: int

    @nn.compact
    def __call__(self, din: int):
        class Inner(nn.Module):
            features: int

            @nn.compact
            def __call__(self, din: int):
                k = self.param("kernel", _HEAD_INIT, (din, self.features),
                               jnp.float32)
                b = self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)
                return k, b

        return Inner(self.features, name="linear")(din)


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
        din = x.shape[-1]
        heads = [("cls_score", self.num_classes),
                 ("det_score", self.num_classes)]
        for i in range(self.num_refs):
            heads.append((f"ref{i+1}", self.num_classes))
            heads.append((f"bbox_pred{i+1}", num_bbox_classes * 4))
        kbs = [_KB(feats, name=name)(din) for name, feats in heads]
        kernel = jnp.concatenate([k for k, _ in kbs], axis=1)
        bias = jnp.concatenate([b for _, b in kbs], axis=0)
        fused = (x.astype(self.compute_dtype)
                 @ kernel.astype(self.compute_dtype)
                 + bias.astype(self.compute_dtype))
        outs, off = [], 0
        for _, feats in heads:
            outs.append(fused[..., off:off + feats])
            off += feats
        cls_logit, det_logit = outs[0], outs[1]
        refs = outs[2::2]
        bbox_preds = outs[3::2]
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
