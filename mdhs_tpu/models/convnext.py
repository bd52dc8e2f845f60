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

CONVNEXT_SPECS = {
    "tiny": (( 3, 3, 9, 3), (96, 192, 384, 768)),
    "small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
}


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(
            self.dim,
            (7, 7),
            padding="SAME",
            feature_group_count=self.dim,
            dtype=self.dtype,
            name="dwconv",
        )(x)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(h)
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(h)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale_init), (self.dim,)
        )
        return x + gamma.astype(self.dtype) * h


class ConvNeXt(nn.Module):
    """ConvNeXt trunk; returns the final NHWC feature map (no pooling/head)."""

    variant: str = "base"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        depths, dims = CONVNEXT_SPECS[self.variant]
        x = x.astype(self.dtype)
        # Stem: 4x4 stride-4 patchify + LN
        x = nn.Conv(dims[0], (4, 4), (4, 4), dtype=self.dtype, name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)
        for stage, (depth, dim) in enumerate(zip(depths, dims)):
            if stage > 0:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"ds{stage}_norm")(x)
                x = nn.Conv(dim, (2, 2), (2, 2), dtype=self.dtype, name=f"ds{stage}_conv")(x)
            for blk in range(depth):
                x = ConvNeXtBlock(dim, dtype=self.dtype, name=f"stage{stage}_block{blk}")(x)
        return x
