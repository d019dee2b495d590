"""Elementwise loss primitives (reference wetectron/layers/).

Pure-jnp: XLA fuses these into surrounding ops; no kernels needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def smooth_l1_loss(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Huber/smooth-L1, elementwise (reference layers/smooth_l1_loss.py)."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def sigmoid_focal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                       gamma: float = 2.0, alpha: float = 0.25) -> jnp.ndarray:
    """RetinaNet focal loss (reference csrc/cuda/SigmoidFocalLoss_cuda.cu and
    the python reference in layers/sigmoid_focal_loss.py:40).

    logits: [N, C] (C foreground classes); targets: [N] int in [0, C]
    (0 = background, c>0 means foreground class c). Returns [N, C].
    """
    num_classes = logits.shape[-1]
    class_range = jnp.arange(1, num_classes + 1, dtype=targets.dtype)[None, :]
    t = targets[:, None]
    p = 1.0 / (1.0 + jnp.exp(-logits))
    term1 = (1.0 - p) ** gamma * jnp.log(jnp.clip(p, 1e-20))
    term2 = p ** gamma * jnp.log(jnp.clip(1.0 - p, 1e-20))
    pos = (t == class_range).astype(logits.dtype)
    neg = ((t != class_range) & (t >= 0)).astype(logits.dtype)
    return -pos * term1 * alpha - neg * term2 * (1.0 - alpha)


def binary_cross_entropy(probs: jnp.ndarray,
                         targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise BCE on probabilities (torch F.binary_cross_entropy).

    torch clamps each log term at -100 (ATen binary_cross_entropy), so the
    loss is finite even at probs of exactly 0 or 1 — f32 epsilon-clips like
    the reference's `clamp(sum, eps, 1-eps)` round back to 1.0 and would
    otherwise yield inf (seen with saturated softmaxes from a random-init
    FrozenBN ResNet)."""
    probs = jnp.clip(probs, 0.0, 1.0)
    log_p = jnp.maximum(jnp.log(probs), -100.0)
    log_1mp = jnp.maximum(jnp.log1p(-probs), -100.0)
    return -(targets * log_p + (1.0 - targets) * log_1mp)


def cross_entropy_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-sample CE with integer labels (torch F.cross_entropy, no reduce)."""
    logz = jnp.max(logits, axis=-1, keepdims=True)
    logsumexp = logz[..., 0] + jnp.log(jnp.sum(jnp.exp(logits - logz), axis=-1))
    picked = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return logsumexp - picked
