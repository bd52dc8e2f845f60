"""MambaVision hierarchical vision backbone (hybrid Mamba + attention).

Capability parity with the NVIDIA MambaVision backbone vendored in the
reference tree (ConNexT/models/block/mamba_vision.py:1246-2420 — imported
but commented out of the shipped model, pl_model_MOE2.py:21). Rebuilt
TPU-native:

- Stages 1-2: conv blocks (3x3 BN GELU 3x3 BN + layer-scale residual)
- Stages 3-4: alternating MambaVisionMixer / self-attention blocks with
  MLPs (reference mamba_vision.py:1639-1832). At 224 input the attention
  windows (14, 7) cover the whole map, so attention is global here.
- MambaVisionMixer (reference :1527-1637): in_proj -> split (x, z) halves;
  x -> causal depthwise conv1d -> silu -> selective scan (our Pallas
  kernel); z -> depthwise conv1d -> silu (no scan); concat -> out_proj.
- Model zoo T/S/B/L factories (reference :1963-2346) and
  MambaVisionEncoder returning (B, N, C) token maps (reference :2348-2420).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..modules.mamba import _a_log_init, _dt_bias_init
from ..ops.selective_scan import selective_scan


class ConvBlock(nn.Module):
    dim: int
    layer_scale: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=self.dtype)
        h = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(x)
        h = norm(name="bn1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(h)
        h = norm(name="bn2")(h)
        gamma = self.param("gamma", nn.initializers.constant(self.layer_scale), (self.dim,))
        return x + gamma.astype(self.dtype) * h


class MambaVisionMixer(nn.Module):
    """Non-causal-friendly SSM mixer: half the channels scanned, half gated."""

    dim: int
    d_state: int = 8
    d_conv: int = 3
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, u):
        B_, L, D = u.shape
        d_inner = D  # expand = 1 in MambaVision
        half = d_inner // 2
        dt_rank = max(1, math.ceil(D / 16))

        xz = nn.Dense(d_inner, use_bias=False, dtype=self.dtype, name="in_proj")(u)
        x, z = jnp.split(xz, 2, axis=-1)

        def dwconv(v, name):
            w = self.param(name + "_w", nn.initializers.lecun_normal(), (self.d_conv, 1, half))
            b = self.param(name + "_b", nn.initializers.zeros, (half,))
            vp = jnp.pad(v, ((0, 0), (self.d_conv - 1, 0), (0, 0)))
            out = jax.lax.conv_general_dilated(
                vp.astype(self.dtype), w.astype(self.dtype), (1,), "VALID",
                dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=half,
            )
            return out + b.astype(self.dtype)

        x = nn.silu(dwconv(x, "conv1d_x"))
        z = nn.silu(dwconv(z, "conv1d_z"))

        dbc = nn.Dense(dt_rank + 2 * self.d_state, use_bias=False, dtype=self.dtype,
                       name="x_proj")(x)
        dt, Bm, Cm = jnp.split(dbc, [dt_rank, dt_rank + self.d_state], axis=-1)
        dt = nn.Dense(half, use_bias=False, dtype=self.dtype, name="dt_proj")(dt)
        dt_bias = self.param("dt_bias", _dt_bias_init(half), (half,))
        dt = nn.softplus(dt.astype(jnp.float32) + dt_bias[None, None, :])
        a_log = self.param("A_log", _a_log_init(half, self.d_state), (half, self.d_state))
        d_skip = self.param("D", nn.initializers.ones, (half,))

        y = selective_scan(
            x.astype(jnp.float32), dt, -jnp.exp(a_log),
            Bm.astype(jnp.float32), Cm.astype(jnp.float32), d_skip,
        ).astype(self.dtype)
        out = jnp.concatenate([y, z], axis=-1)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="out_proj")(out)


class TokenBlock(nn.Module):
    """Transformer-style block: mixer (SSM or MHA) + MLP, both pre-norm."""

    dim: int
    num_heads: int
    use_attention: bool
    mlp_ratio: float = 4.0
    layer_scale: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        g1 = self.param("gamma1", nn.initializers.constant(self.layer_scale), (self.dim,))
        g2 = self.param("gamma2", nn.initializers.constant(self.layer_scale), (self.dim,))
        h = ln("norm1")(x)
        if self.use_attention:
            from ..modules.attention import MultiHeadAttention

            h = MultiHeadAttention(self.dim, self.num_heads, dtype=self.dtype, name="attn")(
                h, h, h
            )
        else:
            h = MambaVisionMixer(self.dim, dtype=self.dtype, name="mixer")(h)
        x = x + g1.astype(self.dtype) * h
        h = ln("norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp_up")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_down")(h)
        return x + g2.astype(self.dtype) * h


MAMBA_VISION_SPECS = {
    # dim, in_dim, depths, num_heads
    "T": (80, 32, (1, 3, 8, 4), (2, 4, 8, 16)),
    "S": (96, 64, (3, 3, 7, 5), (2, 4, 8, 16)),
    "B": (128, 64, (3, 3, 10, 5), (2, 4, 8, 16)),
    "L": (196, 64, (3, 3, 10, 5), (4, 8, 16, 32)),
}


class MambaVision(nn.Module):
    variant: str = "T"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim, in_dim, depths, heads = MAMBA_VISION_SPECS[self.variant]
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=self.dtype)
        x = x.astype(self.dtype)
        # patch embed: two stride-2 convs (reference PatchEmbed)
        x = nn.Conv(in_dim, (3, 3), (2, 2), padding="SAME", dtype=self.dtype, name="stem1")(x)
        x = norm(name="stem1_bn")(x)
        x = nn.relu(x)
        x = nn.Conv(dim, (3, 3), (2, 2), padding="SAME", dtype=self.dtype, name="stem2")(x)
        x = norm(name="stem2_bn")(x)
        x = nn.relu(x)

        for stage in range(4):
            d = dim * (2**stage)
            if stage > 0:  # downsample
                x = nn.Conv(d, (3, 3), (2, 2), padding="SAME", dtype=self.dtype,
                            name=f"ds{stage}")(x)
                x = norm(name=f"ds{stage}_bn")(x)
            if stage < 2:
                for b in range(depths[stage]):
                    x = ConvBlock(d, dtype=self.dtype, name=f"s{stage}_conv{b}")(x, train)
            else:
                B_, H, W, C = x.shape
                tokens = x.reshape(B_, H * W, C)
                n = depths[stage]
                for b in range(n):
                    # second half of each stage uses attention (reference
                    # MambaVisionLayer: mixers first, attention last)
                    use_attn = b >= n // 2
                    tokens = TokenBlock(
                        d, heads[stage], use_attn, dtype=self.dtype,
                        name=f"s{stage}_block{b}",
                    )(tokens)
                x = tokens.reshape(B_, H, W, C)
        return x  # (B, H/32, W/32, dim*8)


class MambaVisionEncoder(nn.Module):
    """Feature-map encoder wrapper returning (B, N, C) tokens
    (reference mamba_vision.py:2348-2420 returns (B, 1568, ...))."""

    variant: str = "T"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        fmap = MambaVision(self.variant, dtype=self.dtype, name="backbone")(x, train)
        B_, H, W, C = fmap.shape
        return fmap.reshape(B_, H * W, C)
