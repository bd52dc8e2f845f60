"""Fused BERT attention sublayer (Pallas TPU kernel).

One kernel computes, per batch row, the entire attention sublayer:

    qkv  = x @ Wqkv + bqkv            (one (L,H*D)x(H*D,3H*D) MXU matmul)
    ctx  = MHA(q, k, v, bias)         (per-head-group f32 softmax in VMEM)
    out  = LayerNorm(x + ctx @ Wo + bo)

Motivation (v5e, batch 256, BERT-base): after ops/fused_attention.py the
attention math itself sits near its in-kernel floor (~1.95 ms/layer), but
XLA still pays three separate q/k/v projection matmuls with an HBM
round-trip of the (B,L,768) q/k/v tensors (~300 MB/layer), another for the
context tensor, and per-op fixed costs. Fusing the whole sublayer shares
one grid sweep: x is read from HBM once, the projection weights stay
resident in VMEM across grid steps (constant index_map), and only the
post-LayerNorm output returns to HBM.

Numerics: identical operations to the XLA path modulo float reassociation —
projections accumulate in f32 (the XLA bf16 path rounds the matmul output
to bf16 *before* adding the bias; here bias adds in f32, i.e. one fewer
rounding), softmax in f32, LayerNorm statistics in f32 (flax LayerNorm
default). Parity-tested against the module path in
tests/test_fused_attention.py.

Autodiff: custom VJP recomputes the sublayer with the XLA reference and
differentiates that, so training (attention_dropout=0) and Grad-CAM work.

Reference parity anchor: HF BertSelfAttention + BertSelfOutput
(reference consumes BERT via encoder.py:112-134 / mibf_net/bert.py:6-13).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_attention import _head_group_size

__all__ = ["attention_block", "attention_block_reference", "supports"]


def _kernel(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, gamma_ref, beta_ref, bias_ref,
    out_ref, qkv_ref, scores_ref, probs_ref, ctx_ref,
    *, num_heads: int, sm_scale: float, ln_eps: float,
):
    L = x_ref.shape[1]
    HD = x_ref.shape[2]
    D = HD // num_heads
    x = x_ref[0]  # (L, HD) bf16

    # --- fused QKV projection: one full-width MXU matmul ---
    qkv = jax.lax.dot_general(
        x, wqkv_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    qkv_ref[:] = (qkv + bqkv_ref[0:1, :]).astype(qkv_ref.dtype)  # (L, 3*HD)

    # --- attention, heads in VMEM-budgeted groups ---
    G = _head_group_size(num_heads, L)
    for g0 in range(0, num_heads, G):
        heads = range(g0, min(g0 + G, num_heads))
        for i, h in enumerate(heads):
            lo = h * D
            scores_ref[i * L : (i + 1) * L, :] = jax.lax.dot_general(
                qkv_ref[:, lo : lo + D],
                qkv_ref[:, HD + lo : HD + lo + D],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        n = len(heads) * L
        s = scores_ref[0:n, :] * sm_scale + bias_ref[0, 0:1, :]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        probs_ref[0:n, :] = (p * pl.reciprocal(denom, approx=False)).astype(probs_ref.dtype)
        for i, h in enumerate(heads):
            lo = h * D
            ctx_ref[:, lo : lo + D] = jnp.dot(
                probs_ref[i * L : (i + 1) * L, :],
                qkv_ref[:, 2 * HD + lo : 2 * HD + lo + D],
                preferred_element_type=jnp.float32,
            ).astype(ctx_ref.dtype)

    # --- output projection + residual + LayerNorm (stats in f32) ---
    attn_out = jax.lax.dot_general(
        ctx_ref[:], wo_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    y = x.astype(jnp.float32) + attn_out + bo_ref[0:1, :]
    mu = jnp.mean(y, axis=-1, keepdims=True)
    yc = y - mu
    var = jnp.mean(yc * yc, axis=-1, keepdims=True)
    norm = yc * jax.lax.rsqrt(var + ln_eps)
    out_ref[0] = (norm * gamma_ref[0:1, :] + beta_ref[0:1, :]).astype(out_ref.dtype)


def _impl(x, wqkv, bqkv, wo, bo, gamma, beta, bias, num_heads, sm_scale, ln_eps):
    B, L, HD = x.shape
    G = _head_group_size(num_heads, L)
    kernel = functools.partial(
        _kernel, num_heads=num_heads, sm_scale=sm_scale, ln_eps=ln_eps
    )
    row_spec = pl.BlockSpec((1, L, HD), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    with jax.default_matmul_precision("default"):
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                row_spec,                       # x
                const((HD, 3 * HD)),            # Wqkv (resident across steps)
                const((1, 3 * HD)),             # bqkv
                const((HD, HD)),                # Wo
                const((1, HD)),                 # bo
                const((1, HD)),                 # gamma
                const((1, HD)),                 # beta
                bias_spec,                      # attention bias
            ],
            out_specs=row_spec,
            out_shape=jax.ShapeDtypeStruct((B, L, HD), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((L, 3 * HD), x.dtype),      # qkv
                pltpu.VMEM((G * L, L), jnp.float32),   # scores
                pltpu.VMEM((G * L, L), x.dtype),       # probs
                pltpu.VMEM((L, HD), x.dtype),          # ctx
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * B * L * HD * (4 * HD) + 4 * B * num_heads * L * L * (HD // num_heads),
                bytes_accessed=2 * B * L * HD * x.dtype.itemsize + 8 * HD * HD,
                transcendentals=B * num_heads * L * L,
            ),
        )(
            x,
            wqkv,
            bqkv.reshape(1, 3 * HD),
            wo,
            bo.reshape(1, HD),
            gamma.reshape(1, HD),
            beta.reshape(1, HD),
            bias.reshape(B, 1, L),
        )


def attention_block_reference(x, wqkv, bqkv, wo, bo, gamma, beta, bias,
                              num_heads, sm_scale, ln_eps):
    """XLA reference: same math as the module path (f32 softmax + f32 LN)."""
    B, L, HD = x.shape
    D = HD // num_heads
    qkv = jnp.dot(x, wqkv) + bqkv  # compute dtype
    q, k, v = jnp.split(qkv, 3, axis=-1)
    qs = q.reshape(B, L, num_heads, D)
    ks = k.reshape(B, L, num_heads, D)
    vs = v.reshape(B, L, num_heads, D)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qs, ks).astype(jnp.float32) * sm_scale
    scores = scores + bias[:, None, None, :].astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, vs).reshape(B, L, HD)
    y = (x + (jnp.dot(ctx, wo) + bo)).astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    yc = y - mu
    var = jnp.mean(yc * yc, axis=-1, keepdims=True)
    norm = yc * jax.lax.rsqrt(var + ln_eps)
    return (norm * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def attention_block(x, wqkv, bqkv, wo, bo, gamma, beta, bias,
                    num_heads: int, sm_scale: float, ln_eps: float):
    """Fused attention sublayer. See module docstring.

    Args:
      x: (B, L, HD) bf16 hidden states. L multiple of 128, <= 512.
      wqkv: (HD, 3*HD) packed [Wq | Wk | Wv] projection (compute dtype).
      bqkv: (3*HD,) packed bias. wo/bo: output projection. gamma/beta:
        LayerNorm params. bias: (B, L) additive f32 key mask bias.
    """
    return _impl(x, wqkv, bqkv, wo, bo, gamma, beta, bias, num_heads, sm_scale, ln_eps)


def _fwd(x, wqkv, bqkv, wo, bo, gamma, beta, bias, num_heads, sm_scale, ln_eps):
    out = _impl(x, wqkv, bqkv, wo, bo, gamma, beta, bias, num_heads, sm_scale, ln_eps)
    return out, (x, wqkv, bqkv, wo, bo, gamma, beta, bias)


def _bwd(num_heads, sm_scale, ln_eps, res, g):
    x, wqkv, bqkv, wo, bo, gamma, beta, bias = res
    _, vjp = jax.vjp(
        lambda *a: attention_block_reference(*a, num_heads, sm_scale, ln_eps),
        x, wqkv, bqkv, wo, bo, gamma, beta, bias,
    )
    return vjp(g)


attention_block.defvjp(_fwd, _bwd)


def supports(dtype, seq_len: int, hidden: int, num_heads: int) -> bool:
    head_dim = hidden // num_heads
    # Gate on the kernel's ACTUAL VMEM footprint (mirrors _impl's
    # scratch_shapes) so wide-hidden configs (e.g. BERT-large H=1024 at
    # L=256: ~18.9MB total) fall back to XLA instead of failing Mosaic
    # compilation at runtime:
    #   resident weights: Wqkv (H,3H) + Wo (H,H) bf16
    #   scratch: qkv (L,3H) bf16 + scores (G*L,L) f32 + probs (G*L,L) bf16
    #            + ctx (L,H) bf16, with G = _head_group_size(heads, L)
    #   io: double-buffered x/out row blocks, 2 x 2 x (L,H) bf16
    G = _head_group_size(num_heads, seq_len)
    resident = 4 * hidden * hidden * 2
    scratch = (
        seq_len * 3 * hidden * 2
        + G * seq_len * seq_len * (4 + 2)
        + seq_len * hidden * 2
    )
    io = 4 * seq_len * hidden * 2
    return (
        dtype == jnp.bfloat16
        # L<=256: with Wqkv+Wo resident the L=512 scratch set exceeds the
        # 16MB VMEM budget; seq-512 configs use ops/fused_attention.py.
        and seq_len % 128 == 0
        and 128 <= seq_len <= 256
        and hidden % 128 == 0
        and head_dim * num_heads == hidden
        and head_dim % 8 == 0
        and resident + scratch + io <= 14 * 1024 * 1024
    )
