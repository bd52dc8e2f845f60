"""ConNexT family: ConvNeXt + BERT bidirectional conv cross-attention,
optional MoE head and multimodal-Mamba fusion.

Parity targets:
- OurClassfierConvnextV2 (reference ConNexT/models/ourmodel.py:34-95):
  ConvNeXt-base map -> 1x1 conv 1024->768; BERT CLS expanded to a 1x1 map;
  bidirectional ConvCrossAttention2D; average-pool both directions; sum;
  Dense -> logits.
- Model4AAAI_MoE (reference pl_model_MOE2.py:95-202): wraps the classifier,
  returns (logits, balance_loss); the MoE head (KAN experts, noisy top-k)
  is wired via config `model.moe` (reference config_ham.yaml:70-72) — the
  reference's shipped forward bypasses it, ours exposes both paths.
- Multimodal Mamba variants (len4mamba) via `fusion="mamba"` with optional
  precomputed LLM hidden-state vectors.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..modules.attention import ConvCrossAttention2D
from ..modules.moe import MoE
from ..modules.multimodal_mamba import MultimodalMamba
from .bert import BertConfig, BertModel
from .convnext import ConvNeXt


class ConNexTClassifier(nn.Module):
    """Bidirectional conv cross-attention ConvNeXt+BERT classifier."""

    num_labels: int = 7
    convnext_variant: str = "base"
    fusion_dim: int = 768
    head: str = "linear"  # "linear" | "moe"
    moe_num_experts: int = 4
    moe_k: int = 2
    # None -> reference default KAN expert stack [in, 512, 128, 32, out]
    # (moe.py:154-160); override for smaller experts
    moe_expert_layers: Optional[tuple] = None
    use_mamba_fusion: bool = False
    llm_hidden_dim: int = 3584
    bert: BertConfig = BertConfig()
    dtype: jnp.dtype = jnp.bfloat16
    remat: str = "none"  # image-tower remat; text tower via bert.remat

    def setup(self):
        self.text_encoder = BertModel(self.bert, dtype=self.dtype)
        self.image_encoder = ConvNeXt(
            variant=self.convnext_variant, dtype=self.dtype, remat=self.remat
        )
        self.reduce_conv = nn.Conv(self.fusion_dim, (1, 1), dtype=self.dtype)
        self.textbased_cross_attention = ConvCrossAttention2D(self.fusion_dim, dtype=self.dtype)
        self.imagbased_cross_attention = ConvCrossAttention2D(self.fusion_dim, dtype=self.dtype)
        if self.use_mamba_fusion:
            from .convnext import CONVNEXT_SPECS

            img_dim = CONVNEXT_SPECS[self.convnext_variant][1][-1]
            self.mamba_fusion = MultimodalMamba(
                text_dim=768,
                img_dim=img_dim,
                hidden_dim=self.llm_hidden_dim,
                proj_dim=256,
                use_kan_attention=True,
                dtype=self.dtype,
            )
            self.mamba_fc = nn.Dense(self.num_labels, dtype=self.dtype)
        if self.head == "moe":
            self.moe = MoE(
                input_size=self.fusion_dim,
                output_size=self.num_labels,
                num_experts=self.moe_num_experts,
                k=self.moe_k,
                expert_layers=self.moe_expert_layers,
                dtype=self.dtype,
            )
        else:
            self.fc = nn.Dense(self.num_labels, dtype=self.dtype)

    def __call__(
        self,
        images,
        input_ids,
        attention_mask,
        first_hidden: Optional[jnp.ndarray] = None,
        last_hidden: Optional[jnp.ndarray] = None,
        train: bool = False,
        deterministic: bool = True,
    ):
        """images NHWC. Returns (logits (B, num_labels), balance_loss scalar)."""
        text_last, _ = self.text_encoder(input_ids, attention_mask, deterministic=deterministic)
        text_cls = text_last[:, 0, :]  # (B, 768)
        fmap = self.image_encoder(images, train=train)  # (B, 7, 7, C)

        if self.use_mamba_fusion:
            B = images.shape[0]
            img_tokens = fmap.reshape(B, -1, fmap.shape[-1])
            zeros = jnp.zeros((B, self.llm_hidden_dim), self.dtype)
            fh = first_hidden if first_hidden is not None else zeros
            lh = last_hidden if last_hidden is not None else zeros
            seq = self.mamba_fusion(text_cls, img_tokens, fh, lh, deterministic=deterministic)
            logits = self.mamba_fc(seq.mean(axis=1)).astype(jnp.float32)
            return logits, jnp.zeros((), jnp.float32)

        reduced = self.reduce_conv(fmap)  # (B, 7, 7, 768)
        text_map = text_cls[:, None, None, :].astype(reduced.dtype)  # (B, 1, 1, 768)

        text_fused = self.textbased_cross_attention(reduced, text_map)
        p1 = text_fused.mean(axis=(1, 2))
        imag_fused = self.imagbased_cross_attention(text_map, reduced)
        p2 = imag_fused.mean(axis=(1, 2))
        fused = p1 + p2

        if self.head == "moe":
            logits, balance = self.moe(fused, train=train)
            return logits.astype(jnp.float32), balance
        logits = self.fc(fused).astype(jnp.float32)
        return logits, jnp.zeros((), jnp.float32)
