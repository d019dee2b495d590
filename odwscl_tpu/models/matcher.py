"""IoU matcher + balanced FG/BG sampler (reference wetectron/modeling/
matcher.py:5 and balanced_positive_negative_sampler.py).

Used by the partial-label WSOD path (weak_head/roi_sampler.py) and kept for
Fast R-CNN-style strong supervision. Batched/masked: instead of the
reference's index tensors, returns per-proposal match ids with the
BELOW_LOW_QUALITY (-1) / BETWEEN_THRESHOLDS (-2) sentinels.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

BELOW_LOW_QUALITY = -1
BETWEEN_THRESHOLDS = -2


def match_proposals(match_quality: jnp.ndarray, gt_mask: jnp.ndarray,
                    high_threshold: float, low_threshold: float,
                    allow_low_quality_matches: bool = False) -> jnp.ndarray:
    """match_quality: [G, P] IoU of gt x proposals; gt_mask: [G].

    Returns [P] int32: matched gt index, or the sentinels (matcher.py).
    """
    quality = jnp.where(gt_mask[:, None], match_quality, -1.0)
    matched_vals = jnp.max(quality, axis=0)
    matches = jnp.argmax(quality, axis=0).astype(jnp.int32)

    below = matched_vals < low_threshold
    between = (matched_vals >= low_threshold) & (matched_vals < high_threshold)
    out = jnp.where(below, BELOW_LOW_QUALITY, matches)
    out = jnp.where(between, BETWEEN_THRESHOLDS, out)

    if allow_low_quality_matches:
        # for each gt, proposals with max quality for that gt keep the match
        best_per_gt = jnp.max(quality, axis=1, keepdims=True)  # [G, 1]
        is_best = (quality == best_per_gt) & (best_per_gt > 0) & gt_mask[:, None]
        any_best = jnp.any(is_best, axis=0)
        out = jnp.where(any_best, matches, out)
    no_gt = ~jnp.any(gt_mask)
    return jnp.where(no_gt, BELOW_LOW_QUALITY, out)


def balanced_sample(rng: jax.Array, labels: jnp.ndarray, valid: jnp.ndarray,
                    batch_size_per_image: int, positive_fraction: float
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """BalancedPositiveNegativeSampler: sample up to p = fraction*batch
    positives (labels > 0) and batch - p negatives (labels == 0), uniformly
    without replacement. Returns (pos_mask, neg_mask) over [P]."""
    p = labels.shape[0]
    num_pos_target = int(batch_size_per_image * positive_fraction)

    is_pos = (labels > 0) & valid
    is_neg = (labels == 0) & valid
    r_pos, r_neg = jax.random.split(rng)

    def pick(mask, r, k):
        scores = jnp.where(mask, jax.random.uniform(r, (p,)), -1.0)
        order = jnp.argsort(-scores)
        rank = jnp.zeros(p, jnp.int32).at[order].set(jnp.arange(p, dtype=jnp.int32))
        avail = mask.sum()
        return mask & (rank < jnp.minimum(k, avail))

    pos = pick(is_pos, r_pos, num_pos_target)
    num_pos = pos.sum()
    neg = pick(is_neg, r_neg, batch_size_per_image - num_pos)
    return pos, neg
