"""MambaVision hierarchical vision backbone (hybrid Mamba + attention).

Full-fidelity TPU rebuild of the NVIDIA MambaVision backbone vendored in the
reference tree (ConNexT/models/block/mamba_vision.py:1246-2420 — imported but
commented out of the shipped model, pl_model_MOE2.py:21):

- PatchEmbed: two stride-2 3x3 convs (no bias) + BatchNorm(eps=1e-4) + ReLU
  (reference :1464-1490).
- Stages 1-2: ConvBlocks — 3x3(bias) BN(1e-5) tanh-GELU 3x3 BN residual;
  layer_scale_conv is None in every zoo entry, so no conv gamma
  (reference :1493-1524, zoo :1963-2346).
- Stages 3-4: windowed token blocks (reference MambaVisionLayer :1739-1830):
  pad H/W to the stage window size, partition into (B*nW, ws*ws, C) windows,
  run Blocks, reverse, crop. At 224 the stage windows (14, 7) cover the map,
  so attention degenerates to global; at 256/512 (L2_512/L3 variants) the
  partitioning is real.
- Block order: mixers first, attention last —
  transformer block indices = range(d//2+1, d) for odd depth, range(d//2, d)
  for even (reference :1898).
- MambaVisionMixer (reference :1527-1637): in_proj (no bias) -> split
  (x, z) halves; SAME-padded depthwise conv1d (no bias: the reference's
  `bias=conv_bias//2` evaluates to 0) + silu on both; selective scan on x
  (our Pallas kernel); concat -> out_proj (no bias). The vendored forward
  applies dt_proj WITH its bias and then passes the same bias again as
  delta_bias to selective_scan (double-add before softplus) — replicated
  exactly, since pretrained checkpoints were trained under it.
- Attention: packed qkv Dense (qkv_bias=True), head_dim^-0.5 scaling, proj
  (reference :1639-1687).
- Final BatchNorm2d `norm` + global pool + `head` for classification
  (reference :1920-1922); the encoder path returns the pre-norm feature map
  (reference forward_features_mamba_fusion :1944-1950).

Zoo: T/T2/S/B/L/L2/L3 (reference :1963-2346; L2_512/L3_512 are window-size
overrides of L2/L3).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .norm import TorchBatchNorm

from ..modules.mamba import _a_log_init, _dt_bias_init
from ..ops.selective_scan import selective_scan
from ..ops.gelu import exact_gelu


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, ws*ws, C) (reference :1302-1314, NHWC here)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def window_reverse(windows: jnp.ndarray, ws: int, H: int, W: int) -> jnp.ndarray:
    """(B*nW, ws*ws, C) -> (B, H, W, C) (reference :1317-1329)."""
    C = windows.shape[-1]
    B = windows.shape[0] // (H * W // ws // ws)
    x = windows.reshape(B, H // ws, W // ws, ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


class PatchEmbed(nn.Module):
    in_dim: int
    dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        # reference :1464-1490: conv(no bias) -> BN(eps=1e-4) -> ReLU, twice
        norm = partial(TorchBatchNorm, use_running_average=not train, momentum=0.9,
                       epsilon=1e-4, dtype=self.dtype)
        x = nn.Conv(self.in_dim, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(norm(name="bn1")(x))
        x = nn.Conv(self.dim, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv2")(x)
        return nn.relu(norm(name="bn2")(x))


class ConvBlock(nn.Module):
    dim: int
    layer_scale: Optional[float] = None  # layer_scale_conv: None in all zoo entries
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(TorchBatchNorm, use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=self.dtype)
        h = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="conv1")(x)
        h = norm(name="bn1")(h)
        h = nn.gelu(h, approximate=True)  # reference uses GELU(approximate='tanh')
        h = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="conv2")(h)
        h = norm(name="bn2")(h)
        if self.layer_scale is not None:
            gamma = self.param("gamma", nn.initializers.constant(self.layer_scale),
                               (self.dim,))
            h = gamma.astype(self.dtype) * h
        return x + h


class MambaVisionMixer(nn.Module):
    """SSM mixer: half the channels scanned, half conv-gated (expand=1)."""

    dim: int
    d_state: int = 8
    d_conv: int = 3
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, u):
        B_, L, D = u.shape
        d_inner = D  # expand = 1 in MambaVision blocks (reference :1722)
        half = d_inner // 2
        dt_rank = max(1, math.ceil(D / 16))

        xz = nn.Dense(d_inner, use_bias=False, dtype=self.dtype, name="in_proj")(u)
        x, z = jnp.split(xz, 2, axis=-1)

        def dwconv(v, name):
            # SAME-padded depthwise conv1d, NO bias (reference conv1d_x/z:
            # padding='same', bias=conv_bias//2 == 0; :1589-1617)
            w = self.param(name, nn.initializers.lecun_normal(), (self.d_conv, 1, half))
            pad_lo = (self.d_conv - 1) // 2
            pad_hi = self.d_conv - 1 - pad_lo
            vp = jnp.pad(v, ((0, 0), (pad_lo, pad_hi), (0, 0)))
            return jax.lax.conv_general_dilated(
                vp.astype(self.dtype), w.astype(self.dtype), (1,), "VALID",
                dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=half,
            )

        x = nn.silu(dwconv(x, "conv1d_x"))
        z = nn.silu(dwconv(z, "conv1d_z"))

        dbc = nn.Dense(dt_rank + 2 * self.d_state, use_bias=False, dtype=self.dtype,
                       name="x_proj")(x)
        dt, Bm, Cm = jnp.split(dbc, [dt_rank, dt_rank + self.d_state], axis=-1)
        dt_w = self.param("dt_proj_kernel", nn.initializers.lecun_normal(),
                          (dt_rank, half))
        dt_bias = self.param("dt_proj_bias", _dt_bias_init(half), (half,))
        # vendored quirk (reference :1620-1630): dt_proj applied WITH bias,
        # then the same bias passed again as delta_bias -> added twice
        # before softplus. Replicated for pretrained-weight parity.
        dt = dt.astype(jnp.float32) @ dt_w + dt_bias[None, None, :]
        dt = nn.softplus(dt + dt_bias[None, None, :])
        a_log = self.param("A_log", _a_log_init(half, self.d_state), (half, self.d_state))
        d_skip = self.param("D", nn.initializers.ones, (half,))

        y = selective_scan(
            x.astype(jnp.float32), dt, -jnp.exp(a_log),
            Bm.astype(jnp.float32), Cm.astype(jnp.float32), d_skip,
        ).astype(self.dtype)
        out = jnp.concatenate([y, z], axis=-1)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="out_proj")(out)


class Attention(nn.Module):
    """Packed-qkv self attention (reference :1639-1687; qkv_bias=True)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B_, N, C = x.shape
        h = self.num_heads
        hd = C // h
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B_, N, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) / (hd**0.5)
        probs = nn.softmax(scores, axis=-1).astype(self.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B_, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(ctx)


class Block(nn.Module):
    """Pre-norm mixer (SSM or attention) + MLP (reference :1690-1737)."""

    dim: int
    num_heads: int
    use_attention: bool
    mlp_ratio: float = 4.0
    layer_scale: Optional[float] = None
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)

        def gamma(name):
            if self.layer_scale is None:
                return 1.0
            return self.param(
                name, nn.initializers.constant(self.layer_scale), (self.dim,)
            ).astype(self.dtype)

        h = ln("norm1")(x)
        if self.use_attention:
            h = Attention(self.dim, self.num_heads, dtype=self.dtype, name="attn")(h)
        else:
            h = MambaVisionMixer(self.dim, dtype=self.dtype, name="mixer")(h)
        x = x + gamma("gamma_1") * h
        h = ln("norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp_up")(h)
        h = exact_gelu(h)  # timm Mlp default: exact (erf) GELU
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_down")(h)
        return x + gamma("gamma_2") * h


def transformer_block_indices(depth: int) -> range:
    """Attention occupies the tail of each token stage (reference :1898)."""
    return range(depth // 2 + 1, depth) if depth % 2 else range(depth // 2, depth)


MAMBA_VISION_SPECS = {
    # dim, in_dim, depths, num_heads, window_size, layer_scale (token blocks)
    "T": dict(dim=80, in_dim=32, depths=(1, 3, 8, 4), heads=(2, 4, 8, 16),
              window=(8, 8, 14, 7), layer_scale=None),
    "T2": dict(dim=80, in_dim=32, depths=(1, 3, 11, 4), heads=(2, 4, 8, 16),
               window=(8, 8, 14, 7), layer_scale=None),
    "S": dict(dim=96, in_dim=64, depths=(3, 3, 7, 5), heads=(2, 4, 8, 16),
              window=(8, 8, 14, 7), layer_scale=None),
    "B": dict(dim=128, in_dim=64, depths=(3, 3, 10, 5), heads=(2, 4, 8, 16),
              window=(8, 8, 14, 7), layer_scale=1e-5),
    "L": dict(dim=196, in_dim=64, depths=(3, 3, 10, 5), heads=(4, 8, 16, 32),
              window=(8, 8, 14, 7), layer_scale=1e-5),
    "L2": dict(dim=196, in_dim=64, depths=(3, 3, 12, 5), heads=(4, 8, 16, 32),
               window=(8, 8, 14, 7), layer_scale=1e-5),
    "L2_512": dict(dim=196, in_dim=64, depths=(3, 3, 12, 5), heads=(4, 8, 16, 32),
                   window=(8, 8, 32, 16), layer_scale=1e-5),
    "L3": dict(dim=256, in_dim=64, depths=(3, 3, 20, 10), heads=(4, 8, 16, 32),
               window=(8, 8, 16, 8), layer_scale=1e-5),
    "L3_512": dict(dim=256, in_dim=64, depths=(3, 3, 20, 10), heads=(4, 8, 16, 32),
                   window=(8, 8, 32, 16), layer_scale=1e-5),
}


class MambaVision(nn.Module):
    """Backbone. __call__ returns the pre-norm feature map (B, H/32, W/32, 8*dim)
    — the encoder path (reference forward_features_mamba_fusion). Use
    `classify` for the BN -> pool -> head classification output."""

    variant: str = "T"
    num_classes: int = 1000
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = True,
                 return_taps: bool = False):
        spec = MAMBA_VISION_SPECS[self.variant]
        dim, in_dim = spec["dim"], spec["in_dim"]
        depths, heads, windows = spec["depths"], spec["heads"], spec["window"]
        layer_scale = spec["layer_scale"]

        x = PatchEmbed(in_dim, dim, dtype=self.dtype, name="patch_embed")(
            x.astype(self.dtype), train
        )
        # Functional taps named like the ResNet trunk's (stem, layer1..4) so
        # the baseline family's Grad-CAM path (analysis/gradcam.py, reference
        # run_analysis.py:126-133) works unchanged when this backbone is
        # selected via image_encoder.backbone: mamba_vision_*. perturb() is
        # a no-op unless a 'perturbations' collection is passed.
        x = self.perturb("stem", x)
        taps = {"stem": x}
        for stage in range(4):
            d = dim * (2**stage)
            n = depths[stage]
            if stage < 2:
                for b in range(n):
                    x = ConvBlock(d, layer_scale=None, dtype=self.dtype,
                                  name=f"s{stage}_conv{b}")(x, train)
            else:
                B_, H, W, C = x.shape
                ws = windows[stage]  # reference pads up to ws, never shrinks
                pad_b = (ws - H % ws) % ws
                pad_r = (ws - W % ws) % ws
                if pad_b or pad_r:
                    x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
                Hp, Wp = H + pad_b, W + pad_r
                tokens = window_partition(x, ws)
                attn_idx = set(transformer_block_indices(n))
                for b in range(n):
                    tokens = Block(
                        d, heads[stage], use_attention=b in attn_idx,
                        layer_scale=layer_scale, dtype=self.dtype,
                        name=f"s{stage}_block{b}",
                    )(tokens)
                x = window_reverse(tokens, ws, Hp, Wp)
                if pad_b or pad_r:
                    x = x[:, :H, :W, :]
            x = self.perturb(f"layer{stage + 1}", x)
            taps[f"layer{stage + 1}"] = x
            if stage < 3:
                x = nn.Conv(d * 2, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                            use_bias=False, dtype=self.dtype, name=f"ds{stage + 1}")(x)
        if features_only:
            return (x, taps) if return_taps else x
        x = TorchBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="norm")(x)
        pooled = x.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(pooled)

    def classify(self, x, train: bool = False):
        return self(x, train=train, features_only=False)


class MambaVisionEncoder(nn.Module):
    """Feature encoder returning (B, N, C) tokens. The reference wrapper
    (mamba_vision.py:2348-2420) channel-major-reshapes the NCHW map to
    (B, 1568, C*HW/1568); here tokens are the standard (B, H*W, C) spatial
    flattening — capability-equivalent and layout-sane."""

    variant: str = "T"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        fmap = MambaVision(self.variant, dtype=self.dtype, name="backbone")(x, train)
        B_, H, W, C = fmap.shape
        return fmap.reshape(B_, H * W, C)
