"""Dtype policy for TPU execution.

TPU-first convention: parameters and optimizer state in float32, activations
and matmuls in bfloat16 (MXU-native), losses/metrics accumulated in float32.
The reference runs fp32 everywhere except a Lightning "16-mixed" config knob
(reference: ConNexT/config_ham.yaml:48); here precision is a first-class,
uniform policy.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32  # logits / losses

    @classmethod
    def from_config(cls, cfg) -> "DTypePolicy":
        name = "bf16"
        if cfg is not None:
            name = cfg.get("training.precision", "bf16") or "bf16"
        return POLICIES.get(str(name).lower(), DTypePolicy())


POLICIES = {
    "bf16": DTypePolicy(),
    "bfloat16": DTypePolicy(),
    "f32": DTypePolicy(compute_dtype=jnp.float32),
    "fp32": DTypePolicy(compute_dtype=jnp.float32),
    "float32": DTypePolicy(compute_dtype=jnp.float32),
}
