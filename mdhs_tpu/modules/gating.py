"""Dual-expert gate (reference modules/gating.py:5-23).

MLP gate sigma over concat(local_feat, context_feat [, entropy scalar])
producing the blending coefficient alpha for local vs context logits.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class DualExpertGate(nn.Module):
    hidden_dim: int = 128
    use_entropy: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, local_feat, context_feat, entropy=None):
        parts = [local_feat, context_feat]
        if self.use_entropy:
            if entropy is None:
                raise ValueError("entropy is required when use_entropy=True")
            parts.append(entropy.astype(local_feat.dtype))
        gate_in = jnp.concatenate(parts, axis=-1)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(gate_in)
        h = nn.relu(h)
        h = nn.Dense(1, dtype=self.dtype, name="fc2")(h)
        return nn.sigmoid(h.astype(jnp.float32))
