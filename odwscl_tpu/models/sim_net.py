"""Contrastive projection head (reference sim_head/sim_net.py:7-27):
2-layer MLP in_dim -> in_dim -> 128, L2-normalized output."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

_KAIMING_OUT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class SimNet(nn.Module):
    embed_dim: int = 128
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.compute_dtype)
        h = nn.Dense(x.shape[-1], dtype=self.compute_dtype,
                     param_dtype=jnp.float32, kernel_init=_KAIMING_OUT,
                     name="mlp0")(x)
        h = nn.relu(h)
        z = nn.Dense(self.embed_dim, dtype=self.compute_dtype,
                     param_dtype=jnp.float32, kernel_init=_KAIMING_OUT,
                     name="mlp1")(h)
        z = z.astype(jnp.float32)
        # L2-normalize with a sqrt-safe floor: padded rois produce exactly-
        # zero embeddings, and jnp.linalg.norm's VJP at 0 is 0/0 = NaN even
        # under a downstream clip (0 * NaN). Clipping the *squared* sum
        # keeps the backward finite (observed: NaN sim_net grads -> the
        # whole model NaN within 3 train steps).
        sq = jnp.clip(jnp.sum(z * z, axis=-1, keepdims=True), 1e-24)
        return z * jax.lax.rsqrt(sq)
