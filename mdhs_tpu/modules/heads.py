"""Classifier heads (registry keys = reference `classifier_type` values).

  mlp                Dense -> ReLU -> Dropout -> Dense
                     (reference model.py:193-200)
  residual           Dense -> ReLU -> ResidualBlock(LN skip) -> Dense
                     (reference modules/heads.py:28-58)
  attention_pooling  learned query attending over the length-1 fused vector
                     (reference modules/heads.py:61-105)
  kan                2x GroupKANLinear with LayerNorm between
                     (reference modules/heads.py:108-140)
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..core.registry import HEADS
from .attention import MultiHeadAttention
from .kan import GroupKANLinear


@HEADS.register("mlp")
class MLPHead(nn.Module):
    hidden_dim: int
    num_classes: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(x)
        return x.astype(jnp.float32)


@HEADS.register("residual")
class ResidualHead(nn.Module):
    hidden_dim: int
    num_classes: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="project")(x)
        x = nn.relu(x)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="res_fc1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="res_fc2")(h)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="res_norm")(x + h)
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(x)
        return x.astype(jnp.float32)


@HEADS.register("attention_pooling")
class AttentionPoolingHead(nn.Module):
    hidden_dim: int
    num_classes: int
    num_heads: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B = x.shape[0]
        seq = x[:, None, :]  # treat the fused vector as a length-1 sequence
        query = self.param("query", nn.initializers.normal(1.0), (1, 1, self.hidden_dim))
        q = jnp.broadcast_to(query, (B, 1, self.hidden_dim)).astype(self.dtype)
        out = MultiHeadAttention(
            self.hidden_dim, self.num_heads, self.dropout, dtype=self.dtype, name="attn"
        )(q, seq, seq, deterministic=deterministic)
        out = out[:, 0, :]
        out = nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(out)
        return out.astype(jnp.float32)


@HEADS.register("kan")
class KANHead(nn.Module):
    hidden_dim: int
    num_classes: int
    dropout: float = 0.1
    num_groups: int = 8
    act_mode: str = "gelu"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.hidden_dim % self.num_groups != 0:
            raise ValueError(
                f"kan num_groups ({self.num_groups}) must divide hidden_dim ({self.hidden_dim})"
            )
        x = GroupKANLinear(
            self.hidden_dim,
            self.hidden_dim,
            num_groups=self.num_groups,
            act_mode=self.act_mode,
            drop=self.dropout,
            dtype=self.dtype,
            name="kan1",
        )(x, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = GroupKANLinear(
            self.hidden_dim,
            self.num_classes,
            num_groups=self.num_groups,
            act_mode=self.act_mode,
            drop=0.0,
            dtype=self.dtype,
            name="kan2",
        )(x, deterministic=deterministic)
        return x.astype(jnp.float32)


@HEADS.register("moe")
class MoEHead(nn.Module):
    """Sparse-MoE classifier head (KAN experts, noisy top-k gating).

    The reference reports an "MoE head" variant (README.md:89, 91.08% HAM)
    built from ConNexT/models/block/moe.py. The balance loss is sown into
    the 'aux_loss' collection; the trainer adds balance_weight * loss.
    """

    hidden_dim: int
    num_classes: int
    dropout: float = 0.0
    num_experts: int = 4
    k: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from .moe import MoE

        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        logits, balance = MoE(
            input_size=self.hidden_dim,
            output_size=self.num_classes,
            num_experts=self.num_experts,
            k=self.k,
            expert_layers=(self.hidden_dim, 4 * self.hidden_dim, self.num_classes),
            dtype=self.dtype,
            name="moe",
        )(x, train=not deterministic)
        self.sow("aux_loss", "moe_balance", balance)
        return logits.astype(jnp.float32)


def build_head(classifier_type: str, *, hidden_dim: int, num_classes: int, dropout: float = 0.1,
               num_heads: int = 8, kan_num_groups: int = 8, kan_act_mode: str = "gelu",
               moe_num_experts: int = 4, moe_k: int = 2,
               dtype=jnp.bfloat16, name: str = "classifier"):
    kwargs = dict(hidden_dim=hidden_dim, num_classes=num_classes, dropout=dropout,
                  dtype=dtype, name=name)
    if classifier_type == "attention_pooling":
        kwargs["num_heads"] = num_heads
    if classifier_type == "kan":
        kwargs.update(num_groups=kan_num_groups, act_mode=kan_act_mode)
    if classifier_type == "moe":
        kwargs.update(num_experts=moe_num_experts, k=moe_k)
    return HEADS.get(classifier_type)(**kwargs)
