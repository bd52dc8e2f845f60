"""Tabular (metadata) branch: 2-layer MLP (reference modules/tabular.py:4-15)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class TabularEncoder(nn.Module):
    hidden_dim: int = 128
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x.astype(self.dtype))
        x = nn.relu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc2")(x)
        return x
