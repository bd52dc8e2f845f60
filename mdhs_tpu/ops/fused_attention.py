"""Fused short-sequence multi-head attention (Pallas TPU kernel).

Motivation (profiled on TPU v5e, see benchmarks/profile_mibf.py and
benchmarks/attention_bench.py): the exact HF-parity attention path
materializes the f32 score tensor (B, H, L, L) in HBM twice per layer — at
batch 256 / seq 128 / 12 heads that is ~200 MB of f32 traffic per BERT
layer, and HBM bandwidth (not MXU FLOPs) is what bounds the text tower.
The generic `jax.experimental.pallas...flash_attention` kernel loses to XLA
here because its grid iterates (batch, head, q-block) → 6144 tiny kernel
invocations at L=128 with per-step online-softmax bookkeeping the short
sequence doesn't need.

This kernel processes ONE BATCH ROW PER GRID STEP: q/k/v arrive in their
natural (B, L, H*D) layout (no host-side transpose), the whole sequence
lives in VMEM, per-head QK^T matmuls write into a single (H*L, L) f32
scratch, the softmax runs as ONE batched VPU pass over all heads, and the
scores never touch HBM. Softmax math is f32 max-subtracted — the same
reductions as the exact XLA path (reference parity: HF BertSelfAttention;
the reference consumes BERT via encoder.py:112-134 / mibf_net/bert.py),
so outputs agree with the einsum path to bf16 rounding
(tests/test_fused_attention.py).

Measured (v5e, B=256 L=128 H=12 D=64, bf16): 1.10x the XLA einsum path
with identical-to-rounding numerics; the naive per-head variant and a
(B,H,L,D)-layout variant both measured SLOWER than XLA (0.90x / 0.71x) —
kept out. Multi-row blocks (R=2/4/8) also regress: they raise VMEM
pressure past the double-buffering sweet spot.

Autodiff: forward runs the kernel; backward recomputes attention with the
XLA reference implementation and differentiates that (same math), so the
op is safe under `jax.grad` (Grad-CAM, training with attention_dropout=0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_attention", "attention_reference", "supports"]


def _head_group_size(num_heads: int, seq_len: int) -> int:
    """Heads per softmax batch, sized so the f32 scores scratch stays ~<=4MB
    (whole-heads scratch at L=512/H=12 would need 12.6MB f32 + 6.3MB bf16 —
    past the 16MB VMEM budget once in/out blocks are double-buffered)."""
    budget_rows = max(seq_len, (4 * 1024 * 1024) // (4 * seq_len))
    g = max(1, budget_rows // seq_len)
    return min(num_heads, g)


def _kernel(
    q_ref, k_ref, v_ref, bias_ref, out_ref, scores_ref, probs_ref, *, num_heads: int, sm_scale: float
):
    """One batch row per grid step; blocks are (1, L, H*D), bias (1, 1, L).

    Heads are processed in groups of G: each group's QK^T matmuls land in a
    shared (G*L, L) f32 scratch, the softmax runs as one batched VPU pass
    per group (better utilization than per-head passes), then G PV matmuls.
    """
    L = q_ref.shape[1]
    head_dim = q_ref.shape[2] // num_heads
    G = _head_group_size(num_heads, L)
    for g0 in range(0, num_heads, G):
        heads = range(g0, min(g0 + G, num_heads))
        for i, h in enumerate(heads):
            lo = h * head_dim
            scores_ref[i * L : (i + 1) * L, :] = jax.lax.dot_general(
                q_ref[0, :, lo : lo + head_dim],
                k_ref[0, :, lo : lo + head_dim],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        n = len(heads) * L
        s = scores_ref[0:n, :] * sm_scale + bias_ref[0, 0:1, :]  # bias broadcasts over rows
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        probs_ref[0:n, :] = (p * pl.reciprocal(denom, approx=False)).astype(probs_ref.dtype)
        for i, h in enumerate(heads):
            lo = h * head_dim
            out_ref[0, :, lo : lo + head_dim] = jnp.dot(
                probs_ref[i * L : (i + 1) * L, :],
                v_ref[0, :, lo : lo + head_dim],
                preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype)


def _fused_attention_impl(q, k, v, bias, num_heads: int, sm_scale: float):
    B, L, HD = q.shape
    kernel = functools.partial(_kernel, num_heads=num_heads, sm_scale=sm_scale)
    row_spec = pl.BlockSpec((1, L, HD), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    head_dim = HD // num_heads
    # Pin matmul precision for the in-kernel dots: a global "highest" default
    # (set by f32 parity tests) would ask Mosaic for multi-pass bf16
    # emulation inside the kernel, which it cannot compile. The kernel
    # already accumulates in f32 via preferred_element_type.
    with jax.default_matmul_precision("default"):
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[row_spec, row_spec, row_spec, bias_spec],
            out_specs=row_spec,
            out_shape=jax.ShapeDtypeStruct((B, L, HD), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((_head_group_size(num_heads, L) * L, L), jnp.float32),
                pltpu.VMEM((_head_group_size(num_heads, L) * L, L), q.dtype),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * B * num_heads * L * L * head_dim,
                bytes_accessed=4 * B * L * HD * q.dtype.itemsize + 4 * B * L,
                transcendentals=B * num_heads * L * L,
            ),
        )(q, k, v, bias.reshape(B, 1, L))


def attention_reference(q, k, v, bias, num_heads: int, sm_scale: float):
    """Exact XLA path (f32 softmax) on the same (B, L, H*D) layout.

    The differentiation target for the custom VJP and the numerics oracle
    for the kernel's parity test.
    """
    B, L, HD = q.shape
    D = HD // num_heads
    qs = q.reshape(B, L, num_heads, D)
    ks = k.reshape(B, L, num_heads, D)
    vs = v.reshape(B, L, num_heads, D)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qs, ks).astype(jnp.float32) * sm_scale
    scores = scores + bias[:, None, None, :].astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, vs)
    return ctx.reshape(B, L, HD)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention(q, k, v, bias, num_heads: int, sm_scale: float):
    """Multi-head attention with VMEM-resident scores.

    Args:
      q, k, v: (B, L, num_heads * head_dim), bf16 or f32. L must be a
        multiple of 128 and small enough for the whole sequence to sit in
        VMEM (L <= 512 — covers BERT seq 128/256/512 used by the reference,
        config.yml:93 / dataset_spine.py:88 / pl_datset.py:183).
      bias: (B, L) additive f32 key bias (0 = attend, -1e9 = padded).
      num_heads: static head count; head_dim = HD // num_heads.
      sm_scale: softmax scale (1/sqrt(head_dim)).

    Returns (B, L, H*D) context, same dtype as q.
    """
    return _fused_attention_impl(q, k, v, bias, num_heads, sm_scale)


def _fwd(q, k, v, bias, num_heads, sm_scale):
    out = _fused_attention_impl(q, k, v, bias, num_heads, sm_scale)
    return out, (q, k, v, bias)


def _bwd(num_heads, sm_scale, res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(
        lambda q, k, v, bias: attention_reference(q, k, v, bias, num_heads, sm_scale),
        q,
        k,
        v,
        bias,
    )
    return vjp(g)


fused_attention.defvjp(_fwd, _bwd)


def supports(dtype, seq_len: int, hidden: int, num_heads: int) -> bool:
    """Static gate: shapes/dtypes this kernel handles efficiently, bounded
    by the actual per-grid-step VMEM footprint (like attention_block/
    ffn_block.supports) so wide-hidden configs (e.g. BERT-large at L=512:
    ~14MB) fall back to XLA instead of failing Mosaic compilation."""
    head_dim = hidden // num_heads
    if not (
        dtype == jnp.bfloat16
        and seq_len % 128 == 0
        and 128 <= seq_len <= 512
        and hidden % 128 == 0
        and head_dim * num_heads == hidden
        and head_dim % 8 == 0
    ):
        return False
    G = _head_group_size(num_heads, seq_len)
    scores = G * seq_len * seq_len * 4          # f32 scores scratch
    probs = G * seq_len * seq_len * 2           # bf16 probs scratch
    io = 4 * 2 * seq_len * hidden * 2           # q/k/v/out blocks, double-buffered
    return scores + probs + io <= 13 * 1024 * 1024
