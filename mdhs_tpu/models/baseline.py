"""MultimodalBaselineModel — the configurable flagship model family.

Parity with reference model.py:21-345: ResNet18/34 tokens + BERT text
tokens -> pluggable fusion -> optional tabular branch -> pluggable head,
with ablation modes (image_only / text_off), dual-expert gating,
sequence-of-slices encoding, and global/local dual-stream.

TPU-first notes:
- NHWC images; ablation modes and gating are *static* config so each mode
  compiles to one straight-line XLA program (no data-dependent branches).
- The gated forward runs context and local feature passes in one program;
  XLA shares the common encoder work.
- Dropout clamped to <=0.1 for fusion/head, as in the reference
  (model.py:61-63).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..modules.fusion import build_fusion, pool_image
from ..modules.gating import DualExpertGate
from ..modules.heads import build_head
from ..modules.sequence import SequenceEncoder
from ..modules.tabular import TabularEncoder
from .bert import BertConfig
from .encoders import ImageTokenEncoder, TextEncoder


@dataclasses.dataclass(frozen=True)
class BaselineConfig:
    num_classes: int = 7
    image_feature_dim: int = 512
    text_feature_dim: int = 768
    hidden_dim: int = 256
    dropout: float = 0.2
    num_heads: int = 8
    image_backbone: str = "resnet18"
    classifier_type: str = "mlp"
    fusion_type: str = "basic"
    text_pool: str = "cls"
    kan_num_groups: int = 8
    kan_act_mode: str = "gelu"
    moe_num_experts: int = 4
    moe_k: int = 2
    tabular_enabled: bool = False
    tabular_input_dim: int = 0
    tabular_hidden_dim: int = 128
    tabular_dropout: float = 0.1
    gate_enabled: bool = False
    gate_hidden_dim: int = 128
    gate_use_entropy: bool = True
    gate_local_mode: str = "image_only"
    gate_context_mode: str = "full"
    sequence_enabled: bool = False
    sequence_type: str = "lstm"
    sequence_hidden_dim: int = 256
    sequence_num_layers: int = 1
    sequence_bidirectional: bool = True
    sequence_dropout: float = 0.1
    sequence_num_heads: int = 4
    global_local_enabled: bool = False
    global_local_crop_ratio: float = 0.6
    global_local_combine: str = "avg"
    remat: str = "none"  # image-tower remat (core/remat.py); text via bert.remat
    bert: BertConfig = dataclasses.field(default_factory=BertConfig)

    @classmethod
    def from_config(cls, cfg, tabular_input_dim: int = 0, bert: BertConfig | None = None):
        """Build from the YAML schema used by the reference config zoo
        (scripts/train.py:179-211 kwarg wiring)."""
        m = cfg.get("model")
        seq = m.get("sequence_encoder", {})
        gate = m.get("gate", {})
        gl = m.get("global_local", {})
        tab = m.get("tabular", {})
        return cls(
            num_classes=m.get("num_classes", 7),
            image_feature_dim=m.get("image_encoder.feature_dim", 512),
            text_feature_dim=m.get("text_encoder.feature_dim", 768),
            hidden_dim=m.get("mlp_head.hidden_dim", 256),
            dropout=m.get("mlp_head.dropout", 0.2),
            image_backbone=m.get("image_encoder.backbone", "resnet18"),
            classifier_type=m.get("classifier_type", "mlp"),
            fusion_type=m.get("fusion_type", "basic"),
            text_pool=m.get("text_pool", "cls"),
            kan_num_groups=m.get("kan.num_groups", 8),
            kan_act_mode=m.get("kan.act_mode", "gelu"),
            moe_num_experts=m.get("moe.num_experts", 4),
            moe_k=m.get("moe.k", 2),
            tabular_enabled=bool(tab.get("enabled", False)),
            tabular_input_dim=tabular_input_dim or tab.get("input_dim", 0),
            tabular_hidden_dim=tab.get("hidden_dim", 128),
            tabular_dropout=tab.get("dropout", 0.1),
            gate_enabled=bool(gate.get("enabled", False)),
            gate_hidden_dim=gate.get("hidden_dim", 128),
            gate_use_entropy=bool(gate.get("use_entropy", True)),
            gate_local_mode=gate.get("local_mode", "image_only"),
            gate_context_mode=gate.get("context_mode", "full"),
            sequence_enabled=bool(seq.get("enabled", False)),
            sequence_type=seq.get("type", "lstm"),
            sequence_hidden_dim=seq.get("hidden_dim", m.get("mlp_head.hidden_dim", 256)),
            sequence_num_layers=seq.get("num_layers", 1),
            sequence_bidirectional=bool(seq.get("bidirectional", True)),
            sequence_dropout=seq.get("dropout", 0.1),
            sequence_num_heads=seq.get("num_heads", 4),
            global_local_enabled=bool(gl.get("enabled", False)),
            global_local_crop_ratio=gl.get("crop_ratio", 0.6),
            global_local_combine=gl.get("combine", "avg"),
            remat=str(cfg.get("training.remat", "none")),
            bert=bert or BertConfig(),
        )


class MultimodalBaselineModel(nn.Module):
    cfg: BaselineConfig
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        c = self.cfg
        fusion_dropout = min(c.dropout, 0.1)
        head_dropout = min(c.dropout, 0.1)

        self.image_encoder = ImageTokenEncoder(
            feature_dim=c.hidden_dim,
            backbone=c.image_backbone,
            multi_scale=(c.fusion_type in ("multiscale", "hierarchical")),
            dtype=self.dtype,
            remat=c.remat,
        )
        self.text_encoder = TextEncoder(c.bert, dtype=self.dtype)

        if c.sequence_enabled:
            self.sequence_encoder = SequenceEncoder(
                input_dim=c.hidden_dim,
                hidden_dim=c.sequence_hidden_dim,
                encoder_type=c.sequence_type,
                num_layers=c.sequence_num_layers,
                bidirectional=c.sequence_bidirectional,
                dropout=c.sequence_dropout,
                num_heads=c.sequence_num_heads,
                dtype=self.dtype,
            )
            if c.sequence_hidden_dim != c.hidden_dim:
                self.sequence_proj = nn.Dense(c.hidden_dim, dtype=self.dtype)

        if c.global_local_enabled and c.global_local_combine == "concat":
            self.global_local_proj = nn.Dense(c.hidden_dim, dtype=self.dtype)

        # hierarchical fusion taps depth-proportional BERT layers: thirds of
        # the stack ((4, 8, 12) for bert-base), scaled to shallower configs
        L = c.bert.num_hidden_layers
        text_layers = tuple(max(1, round(L * i / 3)) for i in (1, 2, 3))
        self.fusion = build_fusion(
            c.fusion_type,
            text_dim=c.text_feature_dim,
            hidden_dim=c.hidden_dim,
            num_heads=c.num_heads,
            dropout=fusion_dropout,
            text_pool=c.text_pool,
            text_layers=text_layers,
            dtype=self.dtype,
        )

        if c.tabular_enabled:
            if c.tabular_input_dim <= 0:
                raise ValueError("tabular_input_dim must be > 0 when tabular is enabled.")
            self.tabular_encoder = TabularEncoder(
                hidden_dim=c.tabular_hidden_dim, dropout=c.tabular_dropout, dtype=self.dtype
            )
            self.tabular_fc = nn.Dense(c.hidden_dim, dtype=self.dtype)
            self.tabular_drop = nn.Dropout(head_dropout)

        if c.gate_enabled:
            self.gate = DualExpertGate(
                hidden_dim=c.gate_hidden_dim, use_entropy=c.gate_use_entropy, dtype=self.dtype
            )

        self.classifier = build_head(
            c.classifier_type,
            hidden_dim=c.hidden_dim,
            num_classes=c.num_classes,
            dropout=head_dropout,
            num_heads=c.num_heads,
            kan_num_groups=c.kan_num_groups,
            kan_act_mode=c.kan_act_mode,
            moe_num_experts=c.moe_num_experts,
            moe_k=c.moe_k,
            dtype=self.dtype,
        )

    # -- image tokens -------------------------------------------------------
    def _center_crop_resize(self, x, ratio):
        """Static center crop + bilinear resize back (reference model.py:292-301)."""
        B, H, W, C = x.shape
        ch = max(1, int(H * ratio))
        cw = max(1, int(W * ratio))
        y0 = max(0, (H - ch) // 2)
        x0 = max(0, (W - cw) // 2)
        cropped = x[:, y0 : y0 + ch, x0 : x0 + cw, :]
        if (ch, cw) != (H, W):
            cropped = jax.image.resize(cropped, (B, H, W, C), method="bilinear")
        return cropped.astype(x.dtype)

    def _combine_tokens(self, g, l):
        c = self.cfg
        if isinstance(g, dict):
            return {k: 0.5 * (g[k] + l[k]) for k in g}
        if c.global_local_combine == "concat":
            return self.global_local_proj(jnp.concatenate([g, l], axis=-1))
        return 0.5 * (g + l)

    def _encode_image_tokens(self, image_input, train, deterministic):
        c = self.cfg
        if image_input.ndim == 5:  # (B, T, H, W, C) sequence of slices
            if not c.sequence_enabled:
                raise ValueError("Sequence input provided but sequence encoder is disabled.")
            B, T = image_input.shape[:2]
            flat = image_input.reshape(B * T, *image_input.shape[2:])
            tokens, _ = self.image_encoder(flat, train=train)
            if c.global_local_enabled:
                local_tokens, _ = self.image_encoder(
                    self._center_crop_resize(flat, c.global_local_crop_ratio), train=train
                )
                tokens = self._combine_tokens(tokens, local_tokens)
            pooled = pool_image(tokens)
            seq_feats = pooled.reshape(B, T, -1)
            seq = self.sequence_encoder(seq_feats, deterministic=deterministic)
            if c.sequence_hidden_dim != c.hidden_dim:
                seq = self.sequence_proj(seq)
            return seq[:, None, :], seq, None

        tokens, taps = self.image_encoder(image_input, train=train)
        if c.global_local_enabled:
            local_tokens, _ = self.image_encoder(
                self._center_crop_resize(image_input, c.global_local_crop_ratio), train=train
            )
            tokens = self._combine_tokens(tokens, local_tokens)
        return tokens, pool_image(tokens), taps

    # -- features -----------------------------------------------------------
    def forward_features(
        self,
        image_input,
        text_input_ids,
        text_attention_mask,
        tabular_input=None,
        ablation_mode: Optional[str] = None,
        train: bool = False,
        deterministic: bool = True,
        return_taps: bool = False,
    ):
        c = self.cfg
        tokens, pooled_image, taps = self._encode_image_tokens(image_input, train, deterministic)

        if ablation_mode == "image_only":
            return (pooled_image, taps) if return_taps else pooled_image

        text_tokens, text_hidden = self.text_encoder(
            text_input_ids, text_attention_mask, deterministic=deterministic
        )
        if ablation_mode == "text_off":
            text_tokens = jnp.zeros_like(text_tokens)
            text_hidden = tuple(jnp.zeros_like(h) for h in text_hidden)

        if (c.sequence_enabled and c.fusion_type in ("multiscale", "hierarchical")
                and not isinstance(tokens, dict)):
            tokens = {k: tokens for k in ("layer2", "layer3", "layer4")}

        if c.fusion_type == "hierarchical":
            fused = self.fusion(
                tokens, text_tokens, text_attention_mask,
                deterministic=deterministic, text_hidden_states=text_hidden,
            )
        else:
            fused = self.fusion(
                tokens, text_tokens, text_attention_mask, deterministic=deterministic
            )

        if c.tabular_enabled:
            if tabular_input is None:
                raise ValueError("tabular_input is required when tabular is enabled.")
            tab = self.tabular_encoder(tabular_input, deterministic=deterministic)
            fused = self.tabular_fc(jnp.concatenate([fused, tab], axis=-1))
            fused = nn.relu(fused)
            fused = self.tabular_drop(fused, deterministic=deterministic)
        return (fused, taps) if return_taps else fused

    def __call__(
        self,
        image_input,
        text_input_ids,
        text_attention_mask,
        tabular_input=None,
        ablation_mode: Optional[str] = None,
        train: bool = False,
        deterministic: bool = True,
    ):
        c = self.cfg
        if ablation_mode is not None or not c.gate_enabled:
            fused = self.forward_features(
                image_input,
                text_input_ids,
                text_attention_mask,
                tabular_input=tabular_input,
                ablation_mode=ablation_mode,
                train=train,
                deterministic=deterministic,
            )
            return self.classifier(fused, deterministic=deterministic)

        context_mode = None if c.gate_context_mode == "full" else c.gate_context_mode
        common = dict(
            tabular_input=tabular_input, train=train, deterministic=deterministic
        )
        context_feat = self.forward_features(
            image_input, text_input_ids, text_attention_mask,
            ablation_mode=context_mode, **common,
        )
        local_feat = self.forward_features(
            image_input, text_input_ids, text_attention_mask,
            ablation_mode=c.gate_local_mode, **common,
        )
        logits_context = self.classifier(context_feat, deterministic=deterministic)
        logits_local = self.classifier(local_feat, deterministic=deterministic)
        entropy = None
        if c.gate_use_entropy:
            probs = jax.nn.softmax(logits_local.astype(jnp.float32), axis=1)
            entropy = -(probs * jnp.log(probs + 1e-8)).sum(axis=1, keepdims=True)
        alpha = self.gate(local_feat, context_feat, entropy)
        return alpha * logits_local + (1 - alpha) * logits_context

    def logits_and_taps(self, image_input, text_input_ids, text_attention_mask,
                        tabular_input=None, ablation_mode=None):
        """Analysis path: (logits, resnet taps) for Grad-CAM
        (reference scripts/run_analysis.py taps stem/layer1-4)."""
        feats, taps = self.forward_features(
            image_input,
            text_input_ids,
            text_attention_mask,
            tabular_input=tabular_input,
            ablation_mode=ablation_mode,
            return_taps=True,
        )
        return self.classifier(feats, deterministic=True), taps

    def features_and_logits(self, *args, **kwargs):
        """Train-loop path: forward_features + classifier (reference
        scripts/train.py:363-381 trains the ungated objective)."""
        feats = self.forward_features(*args, **kwargs)
        return feats, self.classifier(
            feats, deterministic=kwargs.get("deterministic", True)
        )
