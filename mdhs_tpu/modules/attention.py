"""Attention primitives.

- MultiHeadAttention: torch nn.MultiheadAttention-equivalent semantics
  (separate q/k/v projections, optional context dims, key_padding_mask,
  attention-weight dropout) used by the fusion zoo
  (reference: modules/fusion_blocks.py:19-32, 107-112).
- JointKVCrossAttention: MIBF-Net "IBFA" attention — Q from stream x,
  K/V concatenated from both streams (reference: mibf_net/attention.py:47-70).
- ConvCrossAttention2D: ConNexT's 1x1-conv Q/K/V cross attention over
  feature maps (reference: ConNexT/models/ourmodel.py:9-31), NHWC here.

All softmaxes run in f32; matmuls in the module dtype (bf16 on TPU).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

NEG_INF = -1e9


def _masked_softmax(scores: jnp.ndarray, key_mask: Optional[jnp.ndarray], dtype) -> jnp.ndarray:
    """scores: (..., Lq, Lk); key_mask: (B, Lk) with 1=valid, 0=pad."""
    scores = scores.astype(jnp.float32)
    if key_mask is not None:
        bias = (1.0 - key_mask.astype(jnp.float32)) * NEG_INF
        scores = scores + bias[:, None, None, :]
    return nn.softmax(scores, axis=-1).astype(dtype)


class MultiHeadAttention(nn.Module):
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, query, key, value, key_padding_mask=None, deterministic: bool = True):
        d = self.embed_dim
        h = self.num_heads
        head_dim = d // h
        if head_dim * h != d:
            raise ValueError("embed_dim must be divisible by num_heads")
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(query)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(key)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(value)

        def split(x):
            return x.reshape(*x.shape[:-1], h, head_dim)

        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.asarray(
            head_dim**0.5, dtype=self.dtype
        )
        probs = _masked_softmax(scores, key_padding_mask, self.dtype)
        probs = nn.Dropout(self.dropout)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        ctx = ctx.reshape(*query.shape[:-1], d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(ctx)


class JointKVCrossAttention(nn.Module):
    """IBFA-style attention: Q from x; K,V are concat of projections of x and y.

    Reference math (mibf_net/attention.py:47-70): Qx attends over
    [Kx ++ Ky] and mixes [Vx ++ Vy], scaled by sqrt(head_dim), then out-proj.
    """

    dim: int
    num_heads: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, y):
        d, h = self.dim, self.num_heads
        head_dim = d // h
        if head_dim * h != d:
            raise ValueError("dim must be divisible by num_heads")
        dense = lambda name: nn.Dense(d, dtype=self.dtype, name=name)
        qx = dense("to_q_x")(x)
        kx = dense("to_k_x")(x)
        vx = dense("to_v_x")(x)
        ky = dense("to_k_y")(y)
        vy = dense("to_v_y")(y)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], h, head_dim)

        k = jnp.concatenate([split(kx), split(ky)], axis=1)
        v = jnp.concatenate([split(vx), split(vy)], axis=1)
        q = split(qx)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        scores = scores / (head_dim**0.5)
        probs = nn.softmax(scores, axis=-1).astype(self.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(x.shape[0], x.shape[1], d)
        return dense("to_out")(ctx)


class ConvCrossAttention2D(nn.Module):
    """1x1-conv QKV cross attention over NHWC feature maps.

    Q from map x, K/V from map y; attention over y's spatial positions,
    softmax scaled by nothing (reference applies raw dot-product softmax,
    ConNexT/models/ourmodel.py:20-31). Output has x's shape.
    """

    dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, y):
        conv = lambda name: nn.Conv(self.dim, (1, 1), dtype=self.dtype, name=name)
        q = conv("query_conv")(x)
        k = conv("key_conv")(y)
        v = conv("value_conv")(y)
        B, Hx, Wx, C = q.shape
        _, Hy, Wy, _ = k.shape
        qf = q.reshape(B, Hx * Wx, C)
        kf = k.reshape(B, Hy * Wy, C)
        vf = v.reshape(B, Hy * Wy, C)
        scores = jnp.einsum("bqc,bkc->bqk", qf, kf).astype(jnp.float32)
        probs = nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bqk,bkc->bqc", probs, vf)
        return out.reshape(B, Hx, Wx, C)


class SelfAttention2D(nn.Module):
    """Spatial self-attention over an NHWC map with 1/sqrt(C) scaling.

    Parity with mibf_net/attention.py:5-22 (defined there, instantiated but
    unused in the forward pass; provided for completeness).
    """

    dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        flat = x.reshape(B, H * W, C)
        dense = lambda name: nn.Dense(self.dim, dtype=self.dtype, name=name)
        q = dense("query")(flat)
        k = dense("key")(flat)
        v = dense("value")(flat)
        scores = jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32) / (C**0.5)
        probs = nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bqk,bkc->bqc", probs, v)
        return out.reshape(B, H, W, C)
