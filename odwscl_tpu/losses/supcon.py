"""Supervised-contrastive losses over mined pseudo-GT banks.

Reference: wetectron/modeling/roi_heads/sim_head/sim_loss.py. The reference
concatenates per-class embedding banks into a ragged [E, 128] tensor; here
entries arrive as a fixed-capacity slot buffer (embeddings + integer class
labels + validity) produced by the miner's compaction, so
the whole loss is one static [E, E] masked matrix.

Duplicates: the reference may insert the *same* embedding into a bank more
than once (the stage-B `max_index` fallback re-adds an entry that stage A
already contributed). The miner's compaction emits such duplicates as
separate slots, so they appear here as ordinary repeated rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def supcon_v2_loss(features: jnp.ndarray, labels: jnp.ndarray,
                   hardness: jnp.ndarray, valid: jnp.ndarray,
                   temperature: float = 0.2) -> jnp.ndarray:
    """SupConLossV2 (sim_loss.py:44-80), the default ``cfg.loss='supconv2'``.

    features: [E, D] L2-normalized; labels: [E] int class ids;
    hardness: [E] detached per-entry weights (`score_col`);
    valid: [E] bool.

    loss_e = -hardness_e * log( sum_{e'~e, same label} exp(s_ee') /
                                sum_{e'~e} exp(s_ee') ),  mean over entries,
    where e' ranges over all *other* entries (self excluded once per copy).
    """
    e = features.shape[0]
    feats = features.astype(jnp.float32)
    hardness = jax.lax.stop_gradient(hardness)

    sim = feats @ feats.T / temperature
    col_valid = valid[None, :]
    neg_inf = jnp.asarray(-jnp.inf, sim.dtype)
    # numerical stability: subtract the detached row max over valid columns
    # (the reference takes the max over ALL columns incl. self, sim_loss.py:63)
    row_max = jnp.max(jnp.where(col_valid, sim, neg_inf), axis=1, keepdims=True)
    sim = sim - jax.lax.stop_gradient(row_max)

    exp_sim = jnp.where(col_valid, jnp.exp(sim), 0.0)
    valid_f = valid.astype(jnp.float32)

    same = (labels[:, None] == labels[None, :]) & valid[:, None] & col_valid
    diag_exp = jnp.diagonal(exp_sim)

    # sums over all other entries: each row excludes exactly its own
    # diagonal term (the reference's logits_mask)
    denom = exp_sim @ valid_f - diag_exp
    numer = jnp.where(same, exp_sim, 0.0) @ valid_f - diag_exp

    safe = valid & (numer > 0) & (denom > 0)
    log_prob = jnp.log(jnp.clip(numer, 1e-30) / jnp.clip(denom, 1e-30))
    per_entry = jnp.where(safe, -log_prob * hardness, 0.0)

    return jnp.sum(per_entry) / jnp.clip(jnp.sum(valid_f), 1.0)


def supcon_loss(features: jnp.ndarray, labels: jnp.ndarray,
                valid: jnp.ndarray, temperature: float = 0.2) -> jnp.ndarray:
    """Classic SupCon, log-softmax form (sim_loss.py:7-42, ``cfg.loss='supcon'``).

    per_entry = -(1/|same|) * sum_{e' same, e'!=e} log softmax_e'(sim_e)
    (the count includes self; the sum excludes it — an upstream quirk kept
    for parity, sim_loss.py:38-40)
    """
    e = features.shape[0]
    feats = features.astype(jnp.float32)
    sim = feats @ feats.T / temperature
    col_valid = valid[None, :]
    neg_inf = jnp.asarray(-jnp.inf, sim.dtype)
    row_max = jnp.max(jnp.where(col_valid, sim, neg_inf), axis=1, keepdims=True)
    sim = sim - jax.lax.stop_gradient(row_max)

    exp_sim = jnp.where(col_valid, jnp.exp(sim), 0.0)
    m = valid.astype(jnp.float32)
    diag_exp = jnp.diagonal(exp_sim)
    denom = exp_sim @ m - diag_exp  # logits_mask: all but self

    log_prob = sim - jnp.log(jnp.clip(denom, 1e-30))[:, None]

    same = (labels[:, None] == labels[None, :]) & valid[:, None] & col_valid
    same_f = jnp.where(same, 1.0, 0.0)
    # numerator sums over same-label OTHERS (logits_mask excludes self once
    # per copy); the count deliberately INCLUDES self, matching the
    # reference's `label_mask.sum(1)` denominator (sim_loss.py:38-40)
    num = (same_f * log_prob) @ m - jnp.diagonal(same_f * log_prob)
    cnt = same_f @ m
    per_entry = jnp.where(valid & (cnt > 0), -num / jnp.clip(cnt, 1.0), 0.0)

    return jnp.sum(per_entry) / jnp.clip(jnp.sum(m), 1.0)
