"""BERT text encoder in Flax.

Capability parity with the reference's HF `BertModel.from_pretrained`
(reference: encoder.py:112-134 returns the full last_hidden_state;
mibf_net/bert.py:6-13 and ConNexT/models/BERT.py return the CLS vector).

HF-compatible parameter structure so `bert-base-uncased` torch checkpoints
convert 1:1 (see mdhs_tpu.core.convert). Returns all hidden states so
hierarchical text features (layers 4/8/12) are available without re-running
the tower. Attention runs in bf16 with f32 softmax.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    # Serving-speed mode. Historically bf16 softmax + tanh-approx GELU
    # (~30% faster pre-round-2); since the fused sublayer kernels landed,
    # on kernel-eligible TPU shapes only the tanh-GELU half still applies
    # (the attention/FFN blocks always run f32 softmax), and the measured
    # end-to-end gain is within noise (BENCH_r02: 4403 vs 4395 img/s).
    # Kept for the XLA fallback path; off by default for exact HF parity.
    # Measured logit drift is recorded in PARITY.md ("fast_math").
    fast_math: bool = False
    # Attention implementation (config knob model.text_encoder.attention_impl):
    #   "auto"  — fused short-seq Pallas kernel (ops/fused_attention.py:
    #             whole sequence in VMEM, f32 softmax, scores never hit HBM;
    #             measured 1.10x the einsum path on v5e) when the shape/dtype
    #             qualifies and dropout is off, else the exact XLA path.
    #   "xla"   — einsum + f32 softmax, always.
    #   "fused" — force the fused kernel (errors on unsupported shapes).
    #   "flash" — generic Pallas TPU flash-attention kernel (tiled online
    #             softmax; measured SLOWER than XLA at seq<=512 here, kept
    #             for long-sequence configs).
    attention_impl: str = "auto"
    # Serving quantization (config knob model.text_encoder.quantize):
    #   "none" — exact-parity bf16 path (default; the scored bench mode).
    #   "int8" — a8w8 dynamic quantization of the six per-layer matmuls
    #            (QKV, attention output, FFN in/out) on the int8 MXU
    #            (2x bf16 FLOP rate on v5e). Per-row activation scales,
    #            per-channel weight scales (ops/quant.py); softmax stays
    #            f32, LayerNorm/GELU/embeddings stay bf16. Eval-only: the
    #            knob is ignored when deterministic=False. Accuracy drift
    #            measured in benchmarks/fast_math_drift.py --quantize and
    #            documented in PARITY.md ("int8 serving preset").
    quantize: str = "none"
    # Sequence parallelism (config knob parallel.sequence_parallel, active
    # only when parallel.n_model > 1): the residual stream (B, L, H) is
    # constrained to P(data, model, None) between encoder layers, so
    # LayerNorm/dropout/embedding work divides over the model axis and the
    # per-chip activation footprint shrinks L/n_model-fold; GSPMD inserts
    # the all-gather/reduce-scatter pairs around the TP matmuls
    # (Megatron-SP layout, expressed as sharding constraints instead of
    # hand-written collectives). Stored as ((axis_name, size), ...) so the
    # config stays hashable and mesh-object-free: the constraint binds an
    # AbstractMesh by axis names and resolves against the mesh the inputs
    # actually live on (single-device runs resolve to no-op).
    sp_mesh_shape: tuple = ()
    # Rematerialization of encoder layers (training-memory knob,
    # config: training.remat). "none" saves every intermediate (fastest
    # backward, most HBM); "selective" saves only matmul outputs and
    # recomputes attention scores / softmax / GELU / LayerNorm in the
    # backward (flash-attention-like memory profile, ~VPU-only recompute);
    # "full" saves only layer boundaries. Numerics-preserving: the forward
    # values are identical, only what the backward reads is recomputed.
    remat: str = "none"

    @classmethod
    def tiny(cls) -> "BertConfig":
        """Small config for tests / synthetic runs."""
        return cls(
            vocab_size=512,
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=128,
            max_position_embeddings=128,
        )


class _DenseParams(nn.Module):
    """Declares nn.Dense-identical params (kernel/bias) without computing.

    Used by the fused attention-sublayer path to hand raw weights to the
    Pallas kernel while keeping the exact HF-compatible parameter tree
    (same names, shapes, inits as nn.Dense) — checkpoints are
    interchangeable between attention_impl modes.
    """

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return kernel, bias


class _LayerNormParams(nn.Module):
    """nn.LayerNorm-identical params (scale/bias) without computing."""

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones_init(), (features,))
        bias = self.param("bias", nn.initializers.zeros_init(), (features,))
        return scale, bias


class BertSelfAttention(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, hidden, attn_bias, deterministic: bool, attention_mask=None,
        qkv_params_only: bool = False,
    ):
        c = self.cfg
        head_dim = c.hidden_size // c.num_attention_heads
        if qkv_params_only:
            # Fused-sublayer path (BertLayer): return raw projection weights
            # for ops/attention_block.py. Same param tree as the nn.Dense
            # modules below — only one branch exists per trace.
            return tuple(
                _DenseParams(c.hidden_size, name=n)(c.hidden_size)
                for n in ("query", "key", "value")
            )
        dense = lambda name: nn.Dense(c.hidden_size, dtype=self.dtype, name=name)
        q = dense("query")(hidden)
        k = dense("key")(hidden)
        v = dense("value")(hidden)

        def split(x):
            return x.reshape(*x.shape[:-1], c.num_attention_heads, head_dim)

        # deterministic-only for the same reason as the sublayer blocks in
        # BertLayer: custom-VJP kernels lose to XLA in fwd+bwd.
        use_fused = (
            c.attention_impl in ("auto", "fused")
            and deterministic
            and jax.default_backend() == "tpu"  # Mosaic kernel; CPU meshes use XLA
        )
        if use_fused:
            from ..ops.fused_attention import fused_attention, supports

            if supports(self.dtype, hidden.shape[1], c.hidden_size, c.num_attention_heads):
                # attn_bias is (B, 1, 1, L) additive f32 — the kernel wants (B, L)
                bias2d = attn_bias.reshape(hidden.shape[0], hidden.shape[1])
                ctx = fused_attention(
                    q, k, v, bias2d, c.num_attention_heads, float(head_dim) ** -0.5
                )
                return ctx
            if c.attention_impl == "fused":
                raise ValueError(
                    "attention_impl='fused' but shape/dtype unsupported: "
                    f"dtype={self.dtype}, L={hidden.shape[1]}, H={c.num_attention_heads}"
                )

        q, k, v = split(q), split(k), split(v)
        use_flash = (
            c.attention_impl == "flash"
            and (deterministic or c.attention_dropout == 0.0)
            and hidden.shape[1] % 128 == 0
        )
        if use_flash:
            # Pallas TPU flash attention: tiled online softmax entirely in
            # VMEM — the (B,H,L,L) score tensor never hits HBM (the XLA path
            # materializes it twice per layer). f32 accumulation inside the
            # kernel, so numerics sit between fast_math and the exact path.
            # Known deviation: SegmentIds(q=ids, kv=ids) makes PADDED query
            # rows attend only to padded keys, so hidden states AT PAD
            # POSITIONS differ from the HF path (where pad queries attend to
            # real keys). CLS pooling and any mask-aware consumer are
            # unaffected; consumers of all_hidden at padded positions
            # (analysis paths) should not use the flash knob.
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                SegmentIds, flash_attention)

            seg = None
            if attention_mask is not None:
                ids = attention_mask.astype(jnp.int32)  # pad=0, real=1
                seg = SegmentIds(q=ids, kv=ids)
            # pin matmul precision: a global "highest" default (used by f32
            # parity tests) asks Mosaic for multi-pass bf16 emulation inside
            # the kernel, which it cannot compile
            with jax.default_matmul_precision("default"):
                ctx = flash_attention(
                    q.transpose(0, 2, 1, 3),
                    k.transpose(0, 2, 1, 3),
                    v.transpose(0, 2, 1, 3),
                    segment_ids=seg,
                    sm_scale=float(head_dim) ** -0.5,
                )
            ctx = ctx.transpose(0, 2, 1, 3).astype(self.dtype)
            return ctx.reshape(*hidden.shape[:-1], c.hidden_size)
        if c.fast_math:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.asarray(
                head_dim**0.5, self.dtype
            )
            scores = scores + attn_bias.astype(self.dtype)
            probs = nn.softmax(scores, axis=-1)
        else:
            # (B, H, Lq, Lk) scores; softmax in f32 for stability/parity.
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
            scores = scores / jnp.sqrt(head_dim).astype(jnp.float32)
            scores = scores + attn_bias
            probs = nn.softmax(scores, axis=-1).astype(self.dtype)
        probs = nn.Dropout(c.attention_dropout)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return ctx.reshape(*hidden.shape[:-1], c.hidden_size)


class BertLayer(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, hidden, attn_bias, deterministic: bool, attention_mask=None):
        c = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name=name)
        head_dim = c.hidden_size // c.num_attention_heads
        if c.quantize == "int8" and deterministic:
            # a8w8 serving path: the six matmuls run on the int8 MXU; the
            # attention core (scores/softmax/context, ~3% of layer FLOPs)
            # and LayerNorms keep the exact-path semantics. Same param tree
            # as every other attention_impl mode (checkpoints interchange).
            # On TPU with supported shapes the sublayers run as fused Pallas
            # kernels (ops/quant_kernel.py) — the quantize/dequant passes
            # that made the XLA int8 path SLOWER than bf16 stay in VMEM;
            # otherwise falls back to the XLA int8 composite (ops/quant.py).
            from ..ops import quant_kernel as _qk
            from ..ops.gelu import exact_gelu
            from ..ops.quant import int8_dense

            B, L, Hd = hidden.shape
            dt = self.dtype
            on_tpu = jax.default_backend() == "tpu"
            act = "tanh" if c.fast_math else "erf"
            (qk, qb), (kk, kb), (vk, vb) = BertSelfAttention(
                c, dtype=self.dtype, name="attention"
            )(hidden, attn_bias, deterministic, qkv_params_only=True)
            ow, ob = _DenseParams(c.hidden_size, name="attention_output")(c.hidden_size)
            if on_tpu and _qk.attn_supports(dt, L, c.hidden_size, c.num_attention_heads):
                g, b = _LayerNormParams(name="attention_layernorm")(c.hidden_size)
                wqkv = jnp.concatenate([qk, kk, vk], axis=1)
                bqkv = jnp.concatenate([qb, kb, vb])
                bias2d = attn_bias.reshape(B, L)
                hidden = _qk.int8_attention_block(
                    hidden, wqkv, bqkv, ow, ob, g, b, bias2d,
                    c.num_attention_heads, float(head_dim) ** -0.5,
                    c.layer_norm_eps,
                )
            else:
                q = int8_dense(hidden, qk, qb, dt)
                k = int8_dense(hidden, kk, kb, dt)
                v = int8_dense(hidden, vk, vb, dt)

                def split(x):
                    return x.reshape(*x.shape[:-1], c.num_attention_heads, head_dim)

                q, k, v = split(q), split(k), split(v)
                scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
                scores = scores / jnp.sqrt(head_dim).astype(jnp.float32) + attn_bias
                probs = nn.softmax(scores, axis=-1).astype(dt)
                ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
                ctx = ctx.reshape(*hidden.shape[:-1], c.hidden_size)
                hidden = ln("attention_layernorm")(hidden + int8_dense(ctx, ow, ob, dt))

            w1, b1 = _DenseParams(c.intermediate_size, name="intermediate")(c.hidden_size)
            w2, b2 = _DenseParams(c.hidden_size, name="output")(c.intermediate_size)
            if on_tpu and _qk.supports(dt, B * L, Hd, c.intermediate_size):
                g2, be2 = _LayerNormParams(name="output_layernorm")(c.hidden_size)
                out2d = _qk.int8_ffn_block(
                    hidden.reshape(B * L, Hd), w1, b1, w2, b2, g2, be2,
                    c.layer_norm_eps, act,
                )
                return out2d.reshape(B, L, Hd)
            inter = int8_dense(hidden, w1, b1, dt)
            inter = nn.gelu(inter, approximate=True) if c.fast_math else exact_gelu(inter)
            out = int8_dense(inter, w2, b2, dt)
            return ln("output_layernorm")(hidden + out)
        # Fused sublayer kernels are an EVAL win (1.43x fwd) but a fwd+bwd
        # LOSS (their custom-VJP recompute measured 100 vs 70 ms/step for
        # BERT-base B=128 on v5e), so they gate on `deterministic`, not on
        # dropout rates: training always takes the XLA path even when the
        # config sets dropout to 0.
        use_block = False
        if c.attention_impl in ("auto", "fused") and deterministic and jax.default_backend() == "tpu":
            from ..ops import attention_block as _ab

            use_block = _ab.supports(
                self.dtype, hidden.shape[1], c.hidden_size, c.num_attention_heads
            )
        if use_block:
            # Whole attention sublayer (QKV proj + MHA + out proj + residual
            # + LayerNorm) as one Pallas kernel, weights VMEM-resident.
            # 1.43x the XLA composite on v5e (benchmarks/
            # attention_block_bench.py); same param tree as the module path.
            (qk, qb), (kk, kb), (vk, vb) = BertSelfAttention(
                c, dtype=self.dtype, name="attention"
            )(hidden, attn_bias, deterministic, qkv_params_only=True)
            ow, ob = _DenseParams(c.hidden_size, name="attention_output")(c.hidden_size)
            g, b = _LayerNormParams(name="attention_layernorm")(c.hidden_size)
            dt = self.dtype
            wqkv = jnp.concatenate([qk, kk, vk], axis=1).astype(dt)
            bqkv = jnp.concatenate([qb, kb, vb]).astype(dt)
            bias2d = attn_bias.reshape(hidden.shape[0], hidden.shape[1])
            hidden = _ab.attention_block(
                hidden, wqkv, bqkv, ow.astype(dt), ob.astype(dt),
                g.astype(dt), b.astype(dt), bias2d,
                c.num_attention_heads, float(head_dim) ** -0.5, c.layer_norm_eps,
            )
        else:
            attn_out = BertSelfAttention(c, dtype=self.dtype, name="attention")(
                hidden, attn_bias, deterministic, attention_mask=attention_mask
            )
            attn_out = nn.Dense(c.hidden_size, dtype=self.dtype, name="attention_output")(attn_out)
            attn_out = nn.Dropout(c.hidden_dropout)(attn_out, deterministic=deterministic)
            hidden = ln("attention_layernorm")(hidden + attn_out)

        # FFN fusion is gated independently of the attention block (e.g. at
        # seq 512 the attention block is off for VMEM but the FFN block,
        # which tiles flat rows, still applies).
        use_ffn_block = False
        if (
            c.attention_impl in ("auto", "fused")
            and deterministic
            and jax.default_backend() == "tpu"
        ):
            from ..ops import ffn_block as _fb

            B, L, Hd = hidden.shape
            use_ffn_block = _fb.supports(self.dtype, B * L, Hd, c.intermediate_size)
        if use_ffn_block:
            # Whole FFN sublayer as one kernel: the (B,L,4H) intermediate
            # never leaves VMEM (ops/ffn_block.py). fast_math keeps its
            # tanh-GELU semantics via the kernel's act parameter.
            w1, b1 = _DenseParams(c.intermediate_size, name="intermediate")(c.hidden_size)
            w2, b2 = _DenseParams(c.hidden_size, name="output")(c.intermediate_size)
            g2, be2 = _LayerNormParams(name="output_layernorm")(c.hidden_size)
            dt = self.dtype
            out2d = _fb.ffn_block(
                hidden.reshape(B * L, Hd), w1.astype(dt), b1.astype(dt),
                w2.astype(dt), b2.astype(dt), g2.astype(dt), be2.astype(dt),
                c.layer_norm_eps, "tanh" if c.fast_math else "erf",
            )
            return out2d.reshape(B, L, Hd)
        inter = nn.Dense(c.intermediate_size, dtype=self.dtype, name="intermediate")(hidden)
        if c.fast_math:
            inter = nn.gelu(inter, approximate=True)
        else:
            from ..ops.gelu import exact_gelu  # erf-GELU; poly-tanh form on bf16

            inter = exact_gelu(inter)
        out = nn.Dense(c.hidden_size, dtype=self.dtype, name="output")(inter)
        out = nn.Dropout(c.hidden_dropout)(out, deterministic=deterministic)
        return ln("output_layernorm")(hidden + out)


class BertModel(nn.Module):
    """BERT encoder. Returns (last_hidden_state, all_hidden_states tuple)."""

    cfg: BertConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        token_type_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        c = self.cfg
        B, L = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, L), dtype=jnp.int32)
        if token_type_ids is None:
            token_type_ids = jnp.zeros((B, L), dtype=jnp.int32)

        word = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype, name="word_embeddings")(
            input_ids
        )
        pos_ids = jnp.arange(L)[None, :]
        pos = nn.Embed(
            c.max_position_embeddings, c.hidden_size, dtype=self.dtype, name="position_embeddings"
        )(pos_ids)
        typ = nn.Embed(
            c.type_vocab_size, c.hidden_size, dtype=self.dtype, name="token_type_embeddings"
        )(token_type_ids)
        hidden = word + pos + typ
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="embeddings_layernorm")(
            hidden
        )
        hidden = nn.Dropout(c.hidden_dropout)(hidden, deterministic=deterministic)

        sp = lambda h: h
        if c.sp_mesh_shape:
            from jax.sharding import AbstractMesh, NamedSharding
            from jax.sharding import PartitionSpec as P

            amesh = AbstractMesh(
                tuple(s for _, s in c.sp_mesh_shape),
                tuple(n for n, _ in c.sp_mesh_shape),
            )
            spec = P(c.sp_mesh_shape[0][0], c.sp_mesh_shape[1][0], None)
            sp = lambda h: jax.lax.with_sharding_constraint(
                h, NamedSharding(amesh, spec)
            )
        hidden = sp(hidden)

        # HF-style additive mask: 0 for attend, large negative for padding.
        attn_bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -1e9

        layer_cls = BertLayer
        if c.remat != "none":
            from ..core.remat import remat_policy

            # static_argnums counts the module instance as arg 0, so
            # `deterministic` (a trace-time Python bool) is argnum 3.
            layer_cls = nn.remat(
                BertLayer, policy=remat_policy(c.remat), static_argnums=(3,)
            )
        all_hidden = [hidden]
        for i in range(c.num_hidden_layers):
            hidden = sp(
                layer_cls(c, dtype=self.dtype, name=f"layer_{i}")(
                    hidden, attn_bias, deterministic, attention_mask
                )
            )
            all_hidden.append(hidden)
        return hidden, tuple(all_hidden)


class BertWithPooler(nn.Module):
    """BERT + tanh pooler over CLS (HF BertModel.pooler parity)."""

    cfg: BertConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None, deterministic=True):
        last, all_hidden = BertModel(self.cfg, dtype=self.dtype, name="bert")(
            input_ids, attention_mask, token_type_ids, deterministic
        )
        pooled = nn.Dense(self.cfg.hidden_size, dtype=self.dtype, name="pooler")(last[:, 0])
        pooled = jnp.tanh(pooled)
        return last, pooled, all_hidden
