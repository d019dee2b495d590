"""Concrete DropBlock — the learned adversarial feature-dropping module.

Reference: wetectron/modeling/cdb.py:84-132 (ConvConcreteDB) + the gumbel
softmax at :10-32. A small conv residual block predicts per-cell drop
probabilities on the pooled RoI features; a hard gumbel-softmax sample picks
drop centers, grown to blocks with a stride-1 max pool, applied with the
global keep rescale. It is trained ADVERSARIALLY: its own optimizer ascends
the detection loss (reference engine/trainer.py:229-236, weight DB.WEIGHT).

Differences from the reference: BatchNorm (train-mode batch stats over the
pooled-roi batch) is applied with masked statistics so padded rois don't
pollute them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

_KAIMING_OUT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def gumbel_softmax(rng: jax.Array, logits: jnp.ndarray, tau: float = 1.0,
                   hard: bool = False, eps: float = 1e-10,
                   axis: int = -1) -> jnp.ndarray:
    u = jax.random.uniform(rng, logits.shape)
    g = -jnp.log(-jnp.log(u + eps) + eps)
    y_soft = jax.nn.softmax((logits + g) / tau, axis=axis)
    if not hard:
        return y_soft
    # straight-through: hard one-hot forward, soft gradient
    index = jnp.argmax(y_soft, axis=axis)
    onehot = jax.nn.one_hot(index, logits.shape[axis], axis=axis,
                            dtype=logits.dtype)
    return onehot - jax.lax.stop_gradient(y_soft) + y_soft


class _MaskedBatchNorm(nn.Module):
    """Train-mode batch norm over valid rois only (no running stats — the
    reference trains CDB jointly and never runs it in eval)."""

    @nn.compact
    def __call__(self, x, valid):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        w = valid.astype(x.dtype)[:, None, None, None]
        count = jnp.clip(w.sum() * x.shape[1] * x.shape[2], 1.0)
        mean = (x * w).sum(axis=(0, 1, 2)) / count
        var = (((x - mean) ** 2) * w).sum(axis=(0, 1, 2)) / count
        xhat = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return xhat * scale + bias


class ConvConcreteDB(nn.Module):
    """Input: pooled RoI features [N, r, r, C] + valid mask [N]."""

    drop_prob: float = 0.3    # DB.TAU
    block_size: int = 3       # DB.SIZE
    gsm_tau: float = 0.01     # DB.GSM_THRES
    is_hard: bool = True      # DB.IS_HARD

    @nn.compact
    def __call__(self, x: jnp.ndarray, valid: jnp.ndarray,
                 train: bool = True) -> jnp.ndarray:
        if not train or self.drop_prob == 0.0:
            return x
        xd = jax.lax.stop_gradient(x.astype(jnp.float32))
        gamma = self.drop_prob / (self.block_size ** 2)

        out = nn.Conv(x.shape[-1], (3, 3), use_bias=False,
                      kernel_init=_KAIMING_OUT, name="conv1")(xd)
        out = _MaskedBatchNorm(name="bn1")(out, valid)
        out = nn.relu(out)
        out = nn.Conv(2, (3, 3), use_bias=False, kernel_init=_KAIMING_OUT,
                      name="conv2")(out)
        out = _MaskedBatchNorm(name="bn2")(out, valid)
        identity = nn.Conv(2, (1, 1), use_bias=False,
                           kernel_init=_KAIMING_OUT, name="downsample")(xd)
        out = out + identity

        p_drop = jax.nn.sigmoid(out[..., 0:1]) * gamma
        scores = jnp.concatenate([p_drop, 1.0 - p_drop], axis=-1)
        scores = gumbel_softmax(self.make_rng("augment"),
                                jnp.log(scores + 1e-10), tau=self.gsm_tau,
                                hard=self.is_hard)
        mask = scores[..., 0]  # [N, r, r] drop indicator

        pad = self.block_size // 2
        grown = jax.lax.reduce_window(
            mask, -jnp.inf, jax.lax.max,
            (1, self.block_size, self.block_size), (1, 1, 1),
            ((0, 0), (pad, pad), (pad, pad)))
        if self.block_size % 2 == 0:
            grown = grown[:, :-1, :-1]
        block_mask = 1.0 - grown

        v = valid.astype(jnp.float32)[:, None, None]
        total = jnp.clip(v.sum() * mask.shape[1] * mask.shape[2], 1.0)
        keep = jnp.clip((block_mask * v).sum(), 1.0)
        scale = total / keep
        return x * (block_mask[..., None] * scale).astype(x.dtype)
