"""DropBlock feature augmentation (functional, RNG-explicit).

Reference: wetectron/modeling/dropblock/drop_block.py:7-71. Used two ways in
the WSOD pipeline (weak_head.py:94, vgg16.py:133-137, loss.py:298):

- block_size=3, p=0.3 on pooled RoI features (the ``DB.METHOD='dropblock'``
  augmented view fed to the predictor)
- block_size=1, p=0.3 (``sim_drop``) for the contrastive positive view

Exact reference semantics kept: centers sampled per (N, H, W) — shared
across channels — with gamma = p / block^2; block mask grown with a stride-1
max-pool (SAME-style pad block//2, even sizes crop the trailing row/col);
output rescaled by the GLOBAL count ratio numel/sum over the whole batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dropblock_2d(rng: jax.Array, x: jnp.ndarray, drop_prob: float,
                 block_size: int, deterministic: bool = False,
                 valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """x: [N, H, W, C] (NHWC). Returns same shape.

    `valid` [N] restricts the global rescale statistics to real (non-padded)
    rois — the reference has no padding, so its numel/sum runs over exactly
    the real ones.
    """
    if deterministic or drop_prob == 0.0:
        return x
    n, h, w, _ = x.shape
    gamma = drop_prob / (block_size ** 2)
    centers = (jax.random.uniform(rng, (n, h, w)) < gamma).astype(x.dtype)

    if block_size > 1:
        pad = block_size // 2
        grown = jax.lax.reduce_window(
            centers, -jnp.inf, jax.lax.max,
            window_dimensions=(1, block_size, block_size),
            window_strides=(1, 1, 1),
            padding=((0, 0), (pad, pad), (pad, pad)),
        )
        if block_size % 2 == 0:
            grown = grown[:, :-1, :-1]
    else:
        grown = centers

    block_mask = 1.0 - grown  # 1 = keep
    if valid is None:
        total = jnp.asarray(block_mask.size, x.dtype)
        keep = jnp.sum(block_mask)
    else:
        v = valid.astype(x.dtype)[:, None, None]
        total = jnp.sum(v) * (h * w)
        keep = jnp.sum(block_mask * v)
    scale = total / jnp.maximum(keep, 1.0)
    return x * block_mask[..., None] * scale


def noise_augment(rng: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    """Reference ``noise_pool`` (vgg16.py:177-180): x + N(0,1)*x."""
    noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
    return noise * x + x
