"""Image token encoder and text encoder wrappers.

Parity targets:
- ImageTokenEncoder: ResNet18/34 tapped at layer2/3/4, feature maps
  flattened to (B, H*W, D) token sequences with per-scale Dense projections
  to a shared dim; multi_scale returns the {layer2, layer3, layer4} dict
  (reference encoder.py:13-109).
- TextEncoder: BERT returning full last_hidden_state (reference
  encoder.py:112-134); CLS-only use sites slice [:, 0] themselves.

Functional taps (returned, not hooked) feed Grad-CAM (analysis/gradcam.py).
"""

from __future__ import annotations


import flax.linen as nn
import jax.numpy as jnp

from .bert import BertConfig, BertModel
from .mamba_vision import MambaVision
from .resnet import ResNet


class ImageTokenEncoder(nn.Module):
    """backbone: resnet18/34/50 (reference encoder.py:13-109) or
    mamba_vision_{T,T2,S,B,L,L2,L3,...} — the vendored NVIDIA backbone the
    reference imports into its active model file
    (ConNexT/models/pl_model_MOE2.py:21, backbone at
    ConNexT/models/block/mamba_vision.py:2348-2420), here selectable from
    YAML via model.image_encoder.backbone."""

    feature_dim: int = 512
    backbone: str = "resnet18"
    multi_scale: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    remat: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, 3) NHWC. Returns (tokens, taps)."""
        if self.backbone.startswith("mamba_vision_"):
            variant = self.backbone[len("mamba_vision_"):]
            _, taps = MambaVision(variant=variant, dtype=self.dtype, name="trunk")(
                x, train=train, return_taps=True
            )
        else:
            taps = ResNet(
                backbone=self.backbone, dtype=self.dtype, remat=self.remat,
                name="trunk",
            )(x, train=train)

        def flatten(feat):
            B, H, W, C = feat.shape
            return feat.reshape(B, H * W, C)

        if self.multi_scale:
            tokens = {}
            for key in ("layer2", "layer3", "layer4"):
                proj = nn.Dense(self.feature_dim, dtype=self.dtype, name=f"proj_{key}")
                tokens[key] = proj(flatten(taps[key]))
            return tokens, taps
        tokens = nn.Dense(self.feature_dim, dtype=self.dtype, name="proj_layer4")(
            flatten(taps["layer4"])
        )
        return tokens, taps


class TextEncoder(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, deterministic: bool = True):
        last, all_hidden = BertModel(self.cfg, dtype=self.dtype, name="bert")(
            input_ids, attention_mask, deterministic=deterministic
        )
        return last, all_hidden
