"""ConvNeXt feature extractor in Flax (NHWC).

Parity with the reference's torchvision/HF ConvNeXt encoders:
- convnext-base features -> (B, 7, 7, 1024) map (reference
  ConNexT/models/ourmodel.py:41-63)
- convnext-large features -> (B, 7, 7, 1536) map flattened to (B, C, 49)
  (reference ConNexT/models/pl_model_MOE2.py:29-53)

Standard ConvNeXt-v1 block: depthwise 7x7 -> LN -> pointwise 4x -> GELU ->
pointwise -> layer-scale -> residual. Channels-last end to end (TPU native).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
from ..ops.gelu import exact_gelu

CONVNEXT_SPECS = {
    "tiny": (( 3, 3, 9, 3), (96, 192, 384, 768)),
    "small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
}


def register_convnext_variant(name: str, depths: Sequence[int], dims: Sequence[int]):
    """Register a custom (depths, dims) spec usable as `variant` everywhere
    (model building, converters). Mirrors HF ConvNextConfig's free-form
    depths/hidden_sizes; used by parity tests to build small twins."""
    CONVNEXT_SPECS[name] = (tuple(depths), tuple(dims))


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from jax.ad_checkpoint import checkpoint_name

        h = nn.Conv(
            self.dim,
            (7, 7),
            padding="SAME",
            feature_group_count=self.dim,
            dtype=self.dtype,
            name="dwconv",
        )(x)
        # saved under the "selective" remat policy (core/remat.py); the
        # LN/GELU between the saved dwconv and pwconv outputs is recomputed
        h = checkpoint_name(h, "conv_out")
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(h)
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(h)
        h = exact_gelu(h)  # erf-GELU (poly-tanh form on bf16, ops/gelu.py)
        h = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(h)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale_init), (self.dim,)
        )
        return x + gamma.astype(self.dtype) * h


class ConvNeXtEncoder(nn.Module):
    """Headless ConvNeXt + projection to ``output_dim``.

    Parity: the reference's timm-based factory (ConNexT/models/image_encoder.py:16-76)
    strips the classifier and autodetects the backbone feature dim (attribute
    probe, falling back to a dummy forward) before adding Linear(feat, out).
    Flax shape inference *is* that autodetect: ``nn.Dense`` resolves its input
    dim from the pooled feature at init, for any variant, with no probe pass.
    """

    output_dim: int = 768
    variant: str = "large"
    dtype: jnp.dtype = jnp.bfloat16
    remat: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = ConvNeXt(
            variant=self.variant, dtype=self.dtype, remat=self.remat, name="backbone"
        )(x, train=train)
        pooled = feat.mean(axis=(1, 2))  # timm forward_features + GAP semantics
        return nn.Dense(self.output_dim, dtype=self.dtype, name="projection")(pooled)


def create_convnext_encoder(
    output_dim: int = 768,
    model_variant: str = "large",
    dtype: jnp.dtype = jnp.bfloat16,
    **_kwargs,
) -> ConvNeXtEncoder:
    """Factory mirroring reference create_convnext_encoder (image_encoder.py:70-76).

    ``pretrained``/``model_paths`` enter through the config pretrained_path
    mechanism (core/convert.convert_convnext + checkpoint merge) rather than
    timm's hub download (zero-egress environment).
    """
    variant = model_variant.replace("convnext_", "")
    if variant not in CONVNEXT_SPECS:
        raise ValueError(
            f"unknown ConvNeXt variant {model_variant!r}; have {sorted(CONVNEXT_SPECS)}"
        )
    return ConvNeXtEncoder(output_dim=output_dim, variant=variant, dtype=dtype)


class ConvNeXt(nn.Module):
    """ConvNeXt trunk; returns the final NHWC feature map (no pooling/head)."""

    variant: str = "base"
    dtype: jnp.dtype = jnp.bfloat16
    remat: str = "none"  # see core/remat.py; numerics-preserving memory knob

    @nn.compact
    def __call__(self, x, train: bool = False):
        depths, dims = CONVNEXT_SPECS[self.variant]
        block_cls = ConvNeXtBlock
        if self.remat != "none":
            from ..core.remat import remat_policy

            block_cls = nn.remat(ConvNeXtBlock, policy=remat_policy(self.remat))
        x = x.astype(self.dtype)
        # Stem: 4x4 stride-4 patchify + LN
        x = nn.Conv(dims[0], (4, 4), (4, 4), dtype=self.dtype, name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)
        for stage, (depth, dim) in enumerate(zip(depths, dims)):
            if stage > 0:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"ds{stage}_norm")(x)
                x = nn.Conv(dim, (2, 2), (2, 2), dtype=self.dtype, name=f"ds{stage}_conv")(x)
            for blk in range(depth):
                x = block_cls(dim, dtype=self.dtype, name=f"stage{stage}_block{blk}")(x)
        return x
