"""Sequence encoders over per-slice features (reference modules/sequence_blocks.py).

Encodes a (B, T, D) sequence of per-slice image features (neighboring CT/MR
slices) into one vector:
- lstm / gru: (bi)directional recurrent encoder, last-step output + proj
  (reference sequence_blocks.py:22-33, 63-66). Recurrence via lax.scan
  (flax RNN cells) — tiny T (3-5), so a scan is the right TPU shape.
- transformer: sinusoidal PE + torch-style post-norm encoder layers,
  mean-pool + proj (reference sequence_blocks.py:34-45, 68-70).
"""

from __future__ import annotations

import math

import numpy as np

import flax.linen as nn
import jax.numpy as jnp

from .attention import MultiHeadAttention


def sinusoidal_pe(seq_len: int, dim: int) -> jnp.ndarray:
    # Computed host-side in numpy: the table is a trace-time constant
    # (seq_len/dim are Python ints at every call site) and the reference
    # (torch sequence_blocks.py:49-56) computes it on CPU — TPU-device
    # sin/cos approximations drift ~2.5e-5 from the CPU formula, which is
    # visible parity noise for free on a constant.
    pos = np.arange(seq_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float32) * (-math.log(10000.0) / dim))
    pe = np.zeros((seq_len, dim), dtype=np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    # dim//2 cosine slots (one fewer than sine when dim is odd)
    pe[:, 1::2] = np.cos(pos * div[: dim // 2])
    return jnp.asarray(pe)


class _RNNDirection(nn.Module):
    hidden_dim: int
    cell_type: str = "lstm"
    reverse: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cell = (
            nn.OptimizedLSTMCell(self.hidden_dim, dtype=self.dtype, name="cell")
            if self.cell_type == "lstm"
            else nn.GRUCell(self.hidden_dim, dtype=self.dtype, name="cell")
        )
        rnn = nn.RNN(cell, reverse=self.reverse, keep_order=True, name="rnn")
        return rnn(x)


class TransformerEncoderLayer(nn.Module):
    """Post-norm encoder layer matching torch nn.TransformerEncoderLayer defaults
    (self-attn -> dropout -> add -> LN; FF relu -> dropout -> add -> LN)."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = MultiHeadAttention(
            self.d_model, self.num_heads, self.dropout, dtype=self.dtype, name="self_attn"
        )(x, x, x, deterministic=deterministic)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x + h)
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="ff1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="ff2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x + h)


class SequenceEncoder(nn.Module):
    input_dim: int
    hidden_dim: int = 256
    encoder_type: str = "lstm"
    num_layers: int = 1
    bidirectional: bool = True
    dropout: float = 0.1
    num_heads: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        kind = self.encoder_type.lower()
        if kind in ("lstm", "gru"):
            h = x.astype(self.dtype)
            for layer in range(self.num_layers):
                fwd = _RNNDirection(self.hidden_dim, kind, False, self.dtype, name=f"fwd_{layer}")(h)
                if self.bidirectional:
                    bwd = _RNNDirection(self.hidden_dim, kind, True, self.dtype, name=f"bwd_{layer}")(h)
                    h = jnp.concatenate([fwd, bwd], axis=-1)
                else:
                    h = fwd
                if layer + 1 < self.num_layers and self.num_layers > 1:
                    h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            last = h[:, -1, :]
            out_dim = self.hidden_dim * (2 if self.bidirectional else 1)
            if out_dim != self.hidden_dim:
                last = nn.Dense(self.hidden_dim, dtype=self.dtype, name="proj")(last)
            return last
        if kind == "transformer":
            d = self.input_dim
            pe = sinusoidal_pe(x.shape[1], d)
            h = x.astype(self.dtype) + pe[None].astype(self.dtype)
            ff = max(self.hidden_dim * 4, d * 2)
            for layer in range(self.num_layers):
                h = TransformerEncoderLayer(
                    d, self.num_heads, ff, self.dropout, self.dtype, name=f"layer_{layer}"
                )(h, deterministic=deterministic)
            pooled = h.mean(axis=1)
            if d != self.hidden_dim:
                pooled = nn.Dense(self.hidden_dim, dtype=self.dtype, name="proj")(pooled)
            return pooled
        raise ValueError(f"Unsupported sequence encoder type: {self.encoder_type}")
