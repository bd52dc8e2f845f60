"""Fusion zoo: all eight fusion strategies of the reference.

Registry keys mirror the reference's `fusion_type` config values
(reference: model.py:104-153, modules/fusion_blocks.py):

  basic            SD-style block: self-attn -> cross-attn -> FF, mean pool
  multiscale       per-scale (layer2/3/4) text cross-attention, avg of pools
  concat           pooled image ++ pooled text -> Dense
  weighted_concat  learned sigmoid scalar weights before concat
  hadamard         proj(img) * proj(txt) -> LayerNorm
  bilinear         low-rank bilinear (rank 128) -> out proj -> LayerNorm
  mamba            image tokens + broadcast pooled text -> Mamba -> mean pool
  vmamba           project to small dim, add text, VMamba block, out proj

Every fusion takes (img_tokens, txt_tokens, txt_mask, deterministic) and
returns a (B, hidden_dim) fused feature. img_tokens is (B, N, H) or the
multi-scale dict {layer2, layer3, layer4}.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..core.registry import FUSIONS
from ..ops.gelu import exact_gelu
from .attention import MultiHeadAttention
from .mamba import MambaBlock, VMambaBlock


def pool_text(text_tokens: jnp.ndarray, mode: str) -> jnp.ndarray:
    """CLS or mean pooling (reference fusion_blocks.py:169-172)."""
    if mode == "mean":
        return text_tokens.mean(axis=1)
    return text_tokens[:, 0, :]


def pool_image(image_tokens) -> jnp.ndarray:
    """Mean over tokens; dict -> average of per-layer means
    (reference fusion_blocks.py:174-181, model.py:283-290)."""
    if isinstance(image_tokens, dict):
        pooled = [image_tokens[k].mean(axis=1) for k in ("layer2", "layer3", "layer4")]
        return sum(pooled) / float(len(pooled))
    return image_tokens.mean(axis=1)


class BasicTransformerBlock(nn.Module):
    """Pre-norm self-attn -> cross-attn -> FF block
    (reference fusion_blocks.py:7-71)."""

    dim: int
    context_dim: int
    num_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context, context_mask=None, deterministic: bool = True):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        h = ln("norm1")(x)
        h = MultiHeadAttention(
            self.dim, self.num_heads, self.dropout, dtype=self.dtype, name="attn1"
        )(h, h, h, deterministic=deterministic)
        x = x + h

        h = ln("norm2")(x)
        # key/value widths are inferred from the context tensor (torch's
        # kdim/vdim variant maps to the same separate-projection weights,
        # core/convert.py:221)
        h = MultiHeadAttention(
            self.dim,
            self.num_heads,
            self.dropout,
            dtype=self.dtype,
            name="attn2",
        )(h, context, context, key_padding_mask=context_mask, deterministic=deterministic)
        x = x + h

        h = ln("norm3")(x)
        h = nn.Dense(self.dim * 4, dtype=self.dtype, name="ff_up")(h)
        h = exact_gelu(h)  # erf-GELU (poly-tanh form on bf16, ops/gelu.py)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.dim, dtype=self.dtype, name="ff_down")(h)
        return x + h


@FUSIONS.register("basic")
class BasicFusion(nn.Module):
    text_dim: int
    hidden_dim: int
    num_heads: int = 4
    dropout: float = 0.1
    text_pool: str = "cls"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img_tokens, txt_tokens, txt_mask=None, deterministic: bool = True):
        x = BasicTransformerBlock(
            self.hidden_dim,
            self.text_dim,
            self.num_heads,
            self.dropout,
            dtype=self.dtype,
            name="block",
        )(img_tokens, txt_tokens, txt_mask, deterministic)
        return x.mean(axis=1)


class CrossAttentionBlock(nn.Module):
    """Text-conditioned cross-attention + residual + LayerNorm
    (reference fusion_blocks.py:103-128)."""

    text_dim: int
    hidden_dim: int
    num_heads: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img_tokens, txt_tokens, txt_mask=None, deterministic: bool = True):
        txt = nn.Dense(self.hidden_dim, dtype=self.dtype, name="txt_proj")(txt_tokens)
        attn = MultiHeadAttention(
            self.hidden_dim, self.num_heads, self.dropout, dtype=self.dtype, name="attn"
        )(img_tokens, txt, txt, key_padding_mask=txt_mask, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(img_tokens + attn)


@FUSIONS.register("multiscale")
class MultiScaleFusion(nn.Module):
    text_dim: int
    hidden_dim: int
    num_heads: int = 4
    dropout: float = 0.1
    text_pool: str = "cls"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img_tokens, txt_tokens, txt_mask=None, deterministic: bool = True):
        if not isinstance(img_tokens, dict):
            img_tokens = {k: img_tokens for k in ("layer2", "layer3", "layer4")}
        pooled = []
        for key in ("layer2", "layer3", "layer4"):
            t = CrossAttentionBlock(
                self.text_dim,
                self.hidden_dim,
                self.num_heads,
                self.dropout,
                dtype=self.dtype,
                name=f"cross_{key}",
            )(img_tokens[key], txt_tokens, txt_mask, deterministic)
            pooled.append(t.mean(axis=1))
        return (pooled[0] + pooled[1] + pooled[2]) / 3.0


@FUSIONS.register("concat")
class ConcatFusion(nn.Module):
    text_dim: int
    hidden_dim: int
    text_pool: str = "cls"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img_tokens, txt_tokens, txt_mask=None, deterministic: bool = True):
        img = pool_image(img_tokens)
        txt = pool_text(txt_tokens, self.text_pool)
        fused = jnp.concatenate([img, txt.astype(img.dtype)], axis=-1)
        return nn.Dense(self.hidden_dim, dtype=self.dtype, name="proj")(fused)


@FUSIONS.register("weighted_concat")
class WeightedConcatFusion(nn.Module):
    text_dim: int
    hidden_dim: int
    text_pool: str = "cls"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img_tokens, txt_tokens, txt_mask=None, deterministic: bool = True):
        img = pool_image(img_tokens)
        txt = pool_text(txt_tokens, self.text_pool).astype(img.dtype)
        w_img = nn.sigmoid(self.param("w_img", nn.initializers.zeros, (1,)))
        w_txt = nn.sigmoid(self.param("w_txt", nn.initializers.zeros, (1,)))
        fused = jnp.concatenate([img * w_img, txt * w_txt], axis=-1)
        return nn.Dense(self.hidden_dim, dtype=self.dtype, name="proj")(fused)


@FUSIONS.register("hadamard")
class HadamardFusion(nn.Module):
    text_dim: int
    hidden_dim: int
    text_pool: str = "cls"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img_tokens, txt_tokens, txt_mask=None, deterministic: bool = True):
        img = pool_image(img_tokens)
        txt = pool_text(txt_tokens, self.text_pool)
        fused = nn.Dense(self.hidden_dim, dtype=self.dtype, name="img_proj")(img) * nn.Dense(
            self.hidden_dim, dtype=self.dtype, name="txt_proj"
        )(txt)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(fused)


@FUSIONS.register("bilinear")
class BilinearFusion(nn.Module):
    text_dim: int
    hidden_dim: int
    text_pool: str = "cls"
    rank: int = 128
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img_tokens, txt_tokens, txt_mask=None, deterministic: bool = True):
        img = pool_image(img_tokens)
        txt = pool_text(txt_tokens, self.text_pool)
        low = nn.Dense(self.rank, dtype=self.dtype, name="img_proj")(img) * nn.Dense(
            self.rank, dtype=self.dtype, name="txt_proj"
        )(txt)
        out = nn.Dense(self.hidden_dim, dtype=self.dtype, name="out_proj")(low)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(out)


@FUSIONS.register("hierarchical")
class HierarchicalFusion(nn.Module):
    """ResNet layer2/3/4 x BERT hidden-layer 4/8/12 adaptive-weighted fusion.

    Each image scale cross-attends to a depth-matched BERT hidden state
    (shallow<->shallow, deep<->deep); the three pooled streams are combined
    with learned softmax weights (the "adaptive-weighted" part). This is
    the hierarchical-features configuration called out in the rebuild's
    north star (BASELINE.json configs[2]); it needs the full BERT
    hidden-state stack, which our text encoder returns natively.
    """

    text_dim: int
    hidden_dim: int
    num_heads: int = 4
    dropout: float = 0.1
    text_pool: str = "cls"
    text_layers: tuple = (4, 8, 12)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img_tokens, txt_tokens, txt_mask=None, deterministic: bool = True,
                 text_hidden_states=None):
        if not isinstance(img_tokens, dict):
            img_tokens = {k: img_tokens for k in ("layer2", "layer3", "layer4")}
        if text_hidden_states is None:
            text_hidden_states = (txt_tokens,) * (max(self.text_layers) + 1)
        pooled = []
        for key, t_layer in zip(("layer2", "layer3", "layer4"), self.text_layers):
            if t_layer >= len(text_hidden_states):
                raise ValueError(
                    f"hierarchical fusion text_layers index {t_layer} out of "
                    f"range for {len(text_hidden_states)} text hidden states"
                )
            txt = text_hidden_states[t_layer]
            t = CrossAttentionBlock(
                self.text_dim,
                self.hidden_dim,
                self.num_heads,
                self.dropout,
                dtype=self.dtype,
                name=f"cross_{key}",
            )(img_tokens[key], txt, txt_mask, deterministic)
            pooled.append(t.mean(axis=1))
        w = self.param("scale_weights", nn.initializers.zeros, (3,))
        w = nn.softmax(w.astype(jnp.float32)).astype(pooled[0].dtype)
        return w[0] * pooled[0] + w[1] * pooled[1] + w[2] * pooled[2]


@FUSIONS.register("mamba")
class SSMFusion(nn.Module):
    """Image tokens + broadcast pooled text through a Mamba block, mean pool.

    Reference (fusion_blocks.py:264-292) requires the external mamba_ssm CUDA
    package; here the selective scan runs on our Pallas TPU kernel
    (mdhs_tpu.ops.selective_scan).
    """

    text_dim: int
    hidden_dim: int
    text_pool: str = "cls"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img_tokens, txt_tokens, txt_mask=None, deterministic: bool = True):
        if isinstance(img_tokens, dict):
            raise ValueError("SSMFusion expects single-scale image tokens.")
        txt = nn.Dense(self.hidden_dim, dtype=self.dtype, name="txt_proj")(
            pool_text(txt_tokens, self.text_pool)
        )
        tokens = img_tokens + txt[:, None, :]
        tokens = MambaBlock(d_model=self.hidden_dim, dtype=self.dtype, name="mamba")(tokens)
        return tokens.mean(axis=1)


@FUSIONS.register("vmamba")
class VMambaFusion(nn.Module):
    """Project to vmamba_dim, add text, bidirectional VMamba block, out proj
    (reference fusion_blocks.py:295-334; external VMAMBA2Block replaced by a
    native bidirectional Mamba block)."""

    text_dim: int
    hidden_dim: int
    text_pool: str = "cls"
    vmamba_dim: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img_tokens, txt_tokens, txt_mask=None, deterministic: bool = True):
        if isinstance(img_tokens, dict):
            raise ValueError("VMambaFusion expects single-scale image tokens.")
        txt = nn.Dense(self.vmamba_dim, dtype=self.dtype, name="txt_proj")(
            pool_text(txt_tokens, self.text_pool)
        )
        tokens = nn.Dense(self.vmamba_dim, dtype=self.dtype, name="in_proj")(img_tokens)
        tokens = tokens + txt[:, None, :]
        tokens = VMambaBlock(
            dim=self.vmamba_dim,
            num_heads=max(1, self.vmamba_dim // 16),
            dtype=self.dtype,
            name="vmamba",
        )(tokens)
        tokens = nn.Dense(self.hidden_dim, dtype=self.dtype, name="out_proj")(tokens)
        return tokens.mean(axis=1)


def build_fusion(fusion_type: str, *, text_dim: int, hidden_dim: int, num_heads: int = 4,
                 dropout: float = 0.1, text_pool: str = "cls", text_layers=None,
                 dtype=jnp.bfloat16, name="fusion"):
    cls = FUSIONS.get(fusion_type)
    kwargs = dict(text_dim=text_dim, hidden_dim=hidden_dim, text_pool=text_pool, dtype=dtype, name=name)
    if fusion_type in ("basic", "multiscale", "hierarchical"):
        kwargs.update(num_heads=num_heads, dropout=dropout)
    if fusion_type == "hierarchical" and text_layers is not None:
        kwargs.update(text_layers=tuple(text_layers))
    return cls(**kwargs)
