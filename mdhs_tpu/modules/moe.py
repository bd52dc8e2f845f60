"""Sparsely-gated Mixture-of-Experts with KAN experts — TPU formulation.

Capability parity with the reference's tensor2tensor-style MoE
(ConNexT/models/block/moe.py): noisy top-k gating with the normal-CDF
load estimator and the cv^2 importance+load balancing loss, with KAN
experts (default layer stack [in, 512, 128, 32, out], moe.py:154-160).

TPU-first redesign: the reference's `SparseDispatcher` gathers/splits
per-expert variable-size minibatches (moe.py:48-112) — data-dependent
shapes that XLA cannot compile. Here dispatch is **dense**: every expert
runs on the full batch (experts vmapped over a stacked parameter bank),
and outputs are combined by the sparse gate matrix. For the reference's
scale (4 experts, k=2..4) this is strictly faster on TPU than dynamic
gather/scatter, and it is exactly equal in math since gates are zero for
non-selected experts.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .kan import KAN

SQRT2 = 1.4142135623730951


def _normal_cdf(x):
    return 0.5 * (1.0 + jax.lax.erf(x / SQRT2))


def cv_squared(x: jnp.ndarray) -> jnp.ndarray:
    """Squared coefficient of variation (reference moe.py:171-186)."""
    eps = 1e-10
    x = x.astype(jnp.float32)
    if x.shape[0] == 1:
        return jnp.zeros((), jnp.float32)
    return x.var(ddof=1) / (x.mean() ** 2 + eps)


def noisy_top_k_gating(x, w_gate, w_noise, k: int, *, train: bool, rng=None,
                       noise_epsilon: float = 1e-2, load_mode: str = "consistent",
                       noise=None):
    """Returns (gates (B, E), load (E,)). Reference moe.py:198-265.

    The reference softmaxes logits BEFORE top-k and renormalizes the top-k
    probabilities; gates preserve that exactly.

    Load estimator modes — the reference's `_prob_in_top_k` MIXES spaces
    (moe.py:252-262): thresholds come from the top-(k+1) of the *softmaxed*
    noisy values, but `is_in` compares the RAW noisy logits against those
    softmaxed thresholds and the CDF argument uses RAW clean logits. That
    mixing is almost certainly unintended (softmaxed values live in [0,1],
    raw logits don't), so:
      - "consistent" (default): all quantities in softmax space — a sane,
        smooth estimator that preserves the intent (differentiable load
        balancing).
      - "reference": bit-exact replication of the quirky mixing, verified
        against the torch math in tests/test_modules parity
        (test_moe_gating_differential).
    `noise` lets tests inject the exact noise tensor."""
    if load_mode not in ("consistent", "reference"):
        raise ValueError(f"unknown load_mode: {load_mode}")
    num_experts = w_gate.shape[1]
    clean_logits = x.astype(jnp.float32) @ w_gate.astype(jnp.float32)
    noisy = train and (rng is not None or noise is not None)
    if noisy:
        raw_noise = x.astype(jnp.float32) @ w_noise.astype(jnp.float32)
        noise_std = nn.softplus(raw_noise) + noise_epsilon
        if noise is None:
            noise = jax.random.normal(rng, clean_logits.shape)
        noisy_logits = clean_logits + noise.astype(jnp.float32) * noise_std
        logits = noisy_logits
    else:
        noisy_logits, noise_std = clean_logits, None
        logits = clean_logits

    probs = nn.softmax(logits, axis=1)
    m = min(k + 1, num_experts)
    top_probs, top_idx = jax.lax.top_k(probs, m)
    top_k_probs = top_probs[:, :k]
    top_k_idx = top_idx[:, :k]
    top_k_gates = top_k_probs / (top_k_probs.sum(axis=1, keepdims=True) + 1e-6)

    gates = jnp.zeros_like(probs)
    batch_idx = jnp.arange(x.shape[0])[:, None]
    gates = gates.at[batch_idx, top_k_idx].set(top_k_gates)

    if noisy and k < num_experts:
        # Differentiable load: P(expert e in top k) under the gating noise.
        threshold_if_in = top_probs[:, k][:, None]
        threshold_if_out = top_probs[:, k - 1][:, None]
        if load_mode == "reference":
            # exact reference mixing (moe.py:252-262): raw values against
            # softmaxed thresholds
            is_in = noisy_logits > threshold_if_in
            prob_if_in = _normal_cdf((clean_logits - threshold_if_in) / noise_std)
            prob_if_out = _normal_cdf((clean_logits - threshold_if_out) / noise_std)
        else:
            clean_probs = nn.softmax(clean_logits, axis=1)
            is_in = probs > threshold_if_in
            prob_if_in = _normal_cdf((clean_probs - threshold_if_in) / (noise_std + 1e-9))
            prob_if_out = _normal_cdf((clean_probs - threshold_if_out) / (noise_std + 1e-9))
        load = jnp.where(is_in, prob_if_in, prob_if_out).sum(axis=0)
    else:
        load = (gates > 0).astype(jnp.float32).sum(axis=0)
    return gates, load


class MoE(nn.Module):
    """MoE layer: y (B, output_size), aux balance loss scalar."""

    input_size: int
    output_size: int
    num_experts: int = 4
    k: int = 4
    noisy_gating: bool = True
    expert_layers: Sequence[int] | None = None  # default [in, 512, 128, 32, out]
    grid_size: int = 5
    spline_order: int = 3
    loss_coef: float = 1e-2
    load_mode: str = "consistent"  # or "reference" (see noisy_top_k_gating)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.k > self.num_experts:
            raise ValueError("k must be <= num_experts")
        layers = list(self.expert_layers or [self.input_size, 512, 128, 32, self.output_size])

        w_gate = self.param(
            "w_gate", nn.initializers.zeros, (self.input_size, self.num_experts)
        )
        w_noise = self.param(
            "w_noise", nn.initializers.zeros, (self.input_size, self.num_experts)
        )
        rng = self.make_rng("gating") if (train and self.noisy_gating) else None
        gates, load = noisy_top_k_gating(
            x, w_gate, w_noise, self.k, train=train and self.noisy_gating, rng=rng,
            load_mode=self.load_mode,
        )

        importance = gates.sum(axis=0)
        balance_loss = (cv_squared(importance) + cv_squared(load)) * self.loss_coef

        # Dense expert bank: vmap a KAN over a stacked expert parameter axis.
        ExpertBank = nn.vmap(
            KAN,
            in_axes=None,
            out_axes=0,
            axis_size=self.num_experts,
            variable_axes={"params": 0, "kan_state": 0, "intermediates": 0},
            split_rngs={"params": True},
        )
        expert_out = ExpertBank(
            layers_hidden=tuple(layers),
            grid_size=self.grid_size,
            spline_order=self.spline_order,
            dtype=self.dtype,
            name="experts",
        )(x)  # (E, B, out)
        y = jnp.einsum("be,ebo->bo", gates.astype(jnp.float32), expert_out.astype(jnp.float32))
        return y.astype(jnp.float32), balance_loss
