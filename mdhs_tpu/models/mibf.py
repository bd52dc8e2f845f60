"""MIBF-Net: ResNet50 + BERT with IBFA dual cross-attention and MP-Loss.

Parity with reference mibf_net/model_resnet.py:10-94:
- BERT CLS vector (bert.py:11-13) and ResNet50 global feature projected to
  768 (model_resnet.py:15-17), each treated as a length-1 token sequence.
- Two JointKVCrossAttention blocks ("IBFA"): text-based (Q=image, KV from
  both) and image-based (Q=text, KV from both) (attention.py:47-70).
- Three heads: fc on concat -> image_text logits; per-modality MLP heads
  (768 -> 512 -> num_labels).

The MP-Loss (KL-weighted multi-part CE) lives in mdhs_tpu.train.losses.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..modules.attention import JointKVCrossAttention
from .bert import BertConfig, BertModel
from .resnet import ResNetClassifier


class MIBFNet(nn.Module):
    num_labels: int = 6
    bert: BertConfig = BertConfig()
    dtype: jnp.dtype = jnp.bfloat16
    remat: str = "none"  # image-tower remat; text tower via bert.remat

    def setup(self):
        self.text_encoder = BertModel(self.bert, dtype=self.dtype)
        self.image_encoder = ResNetClassifier(
            backbone="resnet50", num_outputs=768, dtype=self.dtype, remat=self.remat
        )
        self.textbased_cross_attention = JointKVCrossAttention(
            dim=768, num_heads=1, dtype=self.dtype
        )
        self.imagbased_cross_attention = JointKVCrossAttention(
            dim=768, num_heads=1, dtype=self.dtype
        )
        self.fc = nn.Dense(self.num_labels, dtype=self.dtype)
        self.fc_image_hidden = nn.Dense(512, dtype=self.dtype)
        self.fc_image_out = nn.Dense(self.num_labels, dtype=self.dtype)
        self.fc_text_hidden = nn.Dense(512, dtype=self.dtype)
        self.fc_text_out = nn.Dense(self.num_labels, dtype=self.dtype)

    def _mlp_head(self, hidden, out, x):
        h = nn.relu(hidden(x.reshape(x.shape[0], -1)))
        return out(h).astype(jnp.float32)

    def __call__(self, images, input_ids, attention_mask, train: bool = False,
                 deterministic: bool = True):
        """images: (B, H, W, 3) NHWC. Returns dict of logits heads."""
        text_last, _ = self.text_encoder(input_ids, attention_mask, deterministic=deterministic)
        text_cls = text_last[:, 0, :]  # (B, 768)
        image_feat, _ = self.image_encoder(images, train=train)  # (B, 768)

        text_seq = text_cls[:, None, :]
        image_seq = image_feat[:, None, :]

        text_fused = self.textbased_cross_attention(image_seq, text_seq)  # Q=image
        image_fused = self.imagbased_cross_attention(text_seq, image_seq)  # Q=text

        p1 = text_fused.reshape(images.shape[0], 768)
        p2 = image_fused.reshape(images.shape[0], 768)
        return {
            "image_text": self.fc(jnp.concatenate([p1, p2], axis=1)).astype(jnp.float32),
            "text": self._mlp_head(self.fc_text_hidden, self.fc_text_out, text_fused),
            "image": self._mlp_head(self.fc_image_hidden, self.fc_image_out, image_fused),
        }
