"""Multimodal Mamba fusion blocks (reference ConNexT/models/block/len4mamba.py).

- KANMultiheadAttention: MHA whose Q/K/V projections are single-layer KANs
  (reference len4mamba.py:21-62).
- MultimodalMamba / MultimodalMambaWithKANAttention: project text CLS (768),
  image map tokens (C x 49), and LLM first/last hidden vectors (3584) to a
  shared 256-d space, concatenate into a 52-token sequence with sinusoidal
  PE, then run [KAN-attention ->] Mamba with residuals
  (reference len4mamba.py:64-185). Mamba rides the Pallas selective scan.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .kan import KAN
from .mamba import MambaBlock
from .sequence import sinusoidal_pe


class KANMultiheadAttention(nn.Module):
    embed_dim: int
    num_heads: int = 8
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        B, L, D = x.shape
        h = self.num_heads
        hd = D // h
        if hd * h != D:
            raise ValueError("embed_dim must be divisible by num_heads")
        q = KAN(layers_hidden=(D, D), dtype=self.dtype, name="q_proj")(x)
        k = KAN(layers_hidden=(D, D), dtype=self.dtype, name="k_proj")(x)
        v = KAN(layers_hidden=(D, D), dtype=self.dtype, name="v_proj")(x)

        def split(t):
            return t.reshape(B, L, h, hd)

        scores = jnp.einsum("bqhd,bkhd->bhqk", split(q), split(k)).astype(jnp.float32)
        scores = scores / (hd**0.5)
        if mask is not None:
            scores = jnp.where(mask == 0, -1e9, scores)
        probs = nn.softmax(scores, axis=-1).astype(self.dtype)
        probs = nn.Dropout(self.dropout)(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, split(v)).reshape(B, L, D)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="out_proj")(out)


class MultimodalMamba(nn.Module):
    """Concat projected modalities -> PE -> Mamba (+residual)."""

    text_dim: int = 768
    img_dim: int = 1568
    hidden_dim: int = 3584
    proj_dim: int = 256
    use_kan_attention: bool = False
    num_heads: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, text, img_tokens, first_hidden, last_hidden,
                 deterministic: bool = True):
        """text: (B, text_dim); img_tokens: (B, N, img_dim);
        first/last_hidden: (B, hidden_dim). Returns (B, N+3, proj_dim)."""
        dense = lambda n: nn.Dense(self.proj_dim, dtype=self.dtype, name=n)
        t = dense("proj_text")(text)[:, None, :]
        i = dense("proj_img")(img_tokens)
        f = dense("proj_first")(first_hidden)[:, None, :]
        l = dense("proj_last")(last_hidden)[:, None, :]
        seq = jnp.concatenate([t, i, f, l], axis=1)
        pe = sinusoidal_pe(seq.shape[1], self.proj_dim)[None].astype(seq.dtype)
        seq = seq + pe

        if self.use_kan_attention:
            attn = KANMultiheadAttention(
                self.proj_dim, self.num_heads, dtype=self.dtype, name="attn"
            )(seq, deterministic=deterministic)
            seq = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(attn + seq)
            mamba_out = MambaBlock(
                d_model=self.proj_dim, d_state=128, dtype=self.dtype, name="mamba"
            )(seq)
            return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(mamba_out + seq)

        mamba_out = MambaBlock(
            d_model=self.proj_dim, d_state=128, dtype=self.dtype, name="mamba"
        )(seq)
        return mamba_out + seq


class SimpleFusion(nn.Module):
    """Stack pooled text/img/LLM-hidden tokens (reference pl_model_MOE2.py:80-92)."""

    proj_dim: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, text_embedding, image_tokens, first_hidden, last_hidden):
        img_global = image_tokens.mean(axis=1)
        t = nn.Dense(self.proj_dim, dtype=self.dtype, name="text_proj")(text_embedding)
        i = nn.Dense(self.proj_dim, dtype=self.dtype, name="img_proj")(img_global)
        h = nn.Dense(self.proj_dim, dtype=self.dtype, name="hidden_proj")(
            jnp.concatenate([first_hidden, last_hidden], axis=1)
        )
        return jnp.stack([t, i, h], axis=1)
