"""Fused int8 a8w8 BERT FFN sublayer (Pallas TPU kernel).

The XLA-level int8 path (ops/quant.py) measured SLOWER than bf16 because
every dynamic-quant step materializes an extra activation pass through
HBM. This kernel removes that traffic: per row-block of the flattened
(B*L, H) hidden states, everything between the bf16 input tile and the
bf16 output tile stays in VMEM —

    sx   = rowmax |x| / 127;  x_i8 = round(x / sx)           (VPU)
    acc1 = x_i8 @ W1_i8 -> int32                             (int8 MXU)
    h    = gelu(acc1 * sx * sw1 + b1)                        (f32, VPU)
    sh   = rowmax |h| / 127;  h_i8 = round(h / sh)           (VPU)
    acc2 = h_i8 @ W2_i8 -> int32                             (int8 MXU)
    out  = LayerNorm(x + acc2 * sh * sw2 + b2)               (f32, VPU)

W1/W2 are pre-quantized per output channel OUTSIDE the kernel (one
weight read per call, fused by XLA) and stay VMEM-resident across grid
steps at HALF the bf16 footprint. v5e's MXU runs int8 x int8 -> int32
at 2x the bf16 FLOP rate (394 TOPS vs 197 TFLOPS), so the matmul time
halves while the HBM traffic equals the bf16 fused kernel's
(ops/ffn_block.py).

Eval-only (the quantize knob is ignored in training — models/bert.py),
so no custom VJP. No reference counterpart (the reference serves fp32
torch); accuracy drift of the whole int8 preset is measured in
benchmarks/fast_math_drift.py and documented in docs/PARITY.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ffn_block import _gelu_poly_f32, _gelu_tanh_f32
from .quant import quantize_weight

__all__ = [
    "int8_ffn_block", "int8_ffn_block_reference", "supports",
    "int8_attention_block", "int8_attention_block_reference", "attn_supports",
]

_ROWS = 256  # int8 min tile is (32, 128); 256 rows amortize the rescales


def _rowquant_f32(x):
    """(R, K) f32 -> (int8 values, (R, 1) f32 scale). Same recipe as
    ops/quant.py::quantize_rows, inlined so it runs on the VPU in-kernel."""
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) * jnp.float32(1.0 / 127.0)
    q = jnp.clip(jnp.round(x / scale), -127.0, 127.0)
    return q.astype(jnp.int8), scale


def _kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
            gamma_ref, beta_ref, out_ref, *, ln_eps: float, act: str):
    x = x_ref[:].astype(jnp.float32)  # (R, H)
    x_i8, sx = _rowquant_f32(x)
    acc1 = jax.lax.dot_general(
        x_i8, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    h = acc1 * sx * s1_ref[0:1, :] + b1_ref[0:1, :]
    h = _gelu_tanh_f32(h) if act == "tanh" else _gelu_poly_f32(h)
    h_i8, sh = _rowquant_f32(h)
    acc2 = jax.lax.dot_general(
        h_i8, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = x + acc2 * sh * s2_ref[0:1, :] + b2_ref[0:1, :]
    mu = jnp.mean(y, axis=-1, keepdims=True)
    yc = y - mu
    var = jnp.mean(yc * yc, axis=-1, keepdims=True)
    norm = yc * jax.lax.rsqrt(var + ln_eps)
    out_ref[:] = (norm * gamma_ref[0:1, :] + beta_ref[0:1, :]).astype(out_ref.dtype)


def int8_ffn_block(x2d, w1, b1, w2, b2, gamma, beta, ln_eps: float,
                   act: str = "erf", *, interpret: bool = False):
    """Fused a8w8 FFN sublayer on (N, H) rows. w1 (H, Di) / w2 (Di, H) are
    the f32 params; per-channel int8 quantization happens here, outside
    the grid. Output dtype follows x2d."""
    N, H = x2d.shape
    Di = w1.shape[1]
    w1_i8, s1 = quantize_weight(w1)
    w2_i8, s2 = quantize_weight(w2)
    kernel = functools.partial(_kernel, ln_eps=float(ln_eps), act=act)
    row_spec = pl.BlockSpec((_ROWS, H), lambda r: (r, 0), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda r: (0,) * len(shape), memory_space=pltpu.VMEM)
    # DEFAULT precision while tracing the kernel body: the test suite's
    # global "highest" would stamp contract_precision<fp32> on the int8
    # MXU dots, which Mosaic rejects ("Bad lhs type").
    with jax.default_matmul_precision("default"):
        return pl.pallas_call(
            kernel,
            grid=(N // _ROWS,),
            in_specs=[
                row_spec,
                const((H, Di)),
                const((1, Di)),
                const((1, Di)),
                const((Di, H)),
                const((1, H)),
                const((1, H)),
                const((1, H)),
                const((1, H)),
            ],
            out_specs=row_spec,
            out_shape=jax.ShapeDtypeStruct((N, H), x2d.dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * N * H * Di,
                bytes_accessed=2 * N * H * x2d.dtype.itemsize + 2 * H * Di,
                transcendentals=N * Di,
            ),
            interpret=interpret,
        )(x2d, w1_i8, s1.reshape(1, Di), b1.astype(jnp.float32).reshape(1, Di),
          w2_i8, s2.reshape(1, H), b2.astype(jnp.float32).reshape(1, H),
          gamma.astype(jnp.float32).reshape(1, H),
          beta.astype(jnp.float32).reshape(1, H))


def int8_ffn_block_reference(x2d, w1, b1, w2, b2, gamma, beta, ln_eps,
                             act="erf"):
    """Same math composed from ops/quant.py (the XLA int8 path), with the
    one intentional kernel difference: the GELU output is re-quantized
    from f32 directly (the unfused path rounds through bf16 first)."""
    from .quant import int8_dense, quantize_rows

    x = x2d.astype(jnp.float32)
    h = int8_dense(x, w1, b1, out_dtype=jnp.float32)
    h = jax.nn.gelu(h, approximate=(act == "tanh"))
    h_i8, sh = quantize_rows(h)
    w2_i8, s2 = quantize_weight(w2)
    acc = jax.lax.dot_general(h_i8, w2_i8, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = x + acc.astype(jnp.float32) * sh * s2[None, :] + b2.astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    yc = y - mu
    var = jnp.mean(yc * yc, axis=-1, keepdims=True)
    norm = yc * jax.lax.rsqrt(var + ln_eps)
    return (norm * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(x2d.dtype)


def _attn_kernel(
    x_ref, wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, so_ref, bo_ref,
    gamma_ref, beta_ref, bias_ref,
    out_ref, qkv_ref, scores_ref, probs_ref, ctx_ref,
    *, num_heads: int, sm_scale: float, ln_eps: float,
):
    """int8 twin of ops/attention_block.py::_kernel: the three projection
    matmuls (QKV packed, output) run on the int8 MXU; the attention core
    (scores / f32 softmax / context — ~3% of layer FLOPs at L=128) keeps
    the exact sublayer's bf16/f32 semantics and scratch layout."""
    from .fused_attention import _head_group_size

    L = x_ref.shape[1]
    HD = x_ref.shape[2]
    D = HD // num_heads
    x = x_ref[0].astype(jnp.float32)  # (L, HD)

    # one row-quantize of x feeds the packed QKV matmul
    x_i8, sx = _rowquant_f32(x)
    acc = jax.lax.dot_general(
        x_i8, wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    qkv_ref[:] = (acc * sx * sqkv_ref[0:1, :] + bqkv_ref[0:1, :]).astype(qkv_ref.dtype)

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

    c_i8, sc = _rowquant_f32(ctx_ref[:].astype(jnp.float32))
    acc2 = jax.lax.dot_general(
        c_i8, wo_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = x + acc2 * sc * so_ref[0:1, :] + bo_ref[0:1, :]
    mu = jnp.mean(y, axis=-1, keepdims=True)
    yc = y - mu
    var = jnp.mean(yc * yc, axis=-1, keepdims=True)
    norm = yc * jax.lax.rsqrt(var + ln_eps)
    out_ref[0] = (norm * gamma_ref[0:1, :] + beta_ref[0:1, :]).astype(out_ref.dtype)


def int8_attention_block(x, wqkv, bqkv, wo, bo, gamma, beta, bias,
                         num_heads: int, sm_scale: float, ln_eps: float,
                         *, interpret: bool = False):
    """Fused a8w8 attention sublayer. Same contract as
    ops/attention_block.py::attention_block, but wqkv/wo are the f32
    params (quantized per output channel here, outside the grid)."""
    from .fused_attention import _head_group_size

    B, L, HD = x.shape
    G = _head_group_size(num_heads, L)
    wqkv_i8, sqkv = quantize_weight(wqkv)
    wo_i8, so = quantize_weight(wo)
    kernel = functools.partial(
        _attn_kernel, num_heads=num_heads, sm_scale=sm_scale, ln_eps=float(ln_eps)
    )
    row_spec = pl.BlockSpec((1, L, HD), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    # DEFAULT precision: same Mosaic int8-dot constraint as int8_ffn_block.
    with jax.default_matmul_precision("default"):
        run = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                row_spec,
                const((HD, 3 * HD)),
                const((1, 3 * HD)),
                const((1, 3 * HD)),
                const((HD, HD)),
                const((1, HD)),
                const((1, HD)),
                const((1, HD)),
                const((1, HD)),
                bias_spec,
            ],
            out_specs=row_spec,
            out_shape=jax.ShapeDtypeStruct((B, L, HD), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((L, 3 * HD), x.dtype),
                pltpu.VMEM((G * L, L), jnp.float32),
                pltpu.VMEM((G * L, L), x.dtype),
                pltpu.VMEM((L, HD), x.dtype),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * B * L * HD * (4 * HD) + 4 * B * num_heads * L * L * (HD // num_heads),
                bytes_accessed=2 * B * L * HD * x.dtype.itemsize + 4 * HD * HD,
                transcendentals=B * num_heads * L * L,
            ),
            interpret=interpret,
        )
        return run(
            x,
            wqkv_i8,
            sqkv.reshape(1, 3 * HD),
            bqkv.astype(jnp.float32).reshape(1, 3 * HD),
            wo_i8,
            so.reshape(1, HD),
            bo.astype(jnp.float32).reshape(1, HD),
            gamma.astype(jnp.float32).reshape(1, HD),
            beta.astype(jnp.float32).reshape(1, HD),
            bias.reshape(B, 1, L),
        )


def int8_attention_block_reference(x, wqkv, bqkv, wo, bo, gamma, beta, bias,
                                   num_heads, sm_scale, ln_eps):
    """XLA int8 composite with the kernel's semantics: f32 dequant of the
    projections, bf16 qkv/ctx, f32 softmax and LayerNorm statistics."""
    from .quant import int8_dense, quantize_rows

    B, L, HD = x.shape
    D = HD // num_heads
    x_f32 = x.astype(jnp.float32)
    qkv = int8_dense(x_f32, wqkv, bqkv, out_dtype=x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    qs = q.reshape(B, L, num_heads, D)
    ks = k.reshape(B, L, num_heads, D)
    vs = v.reshape(B, L, num_heads, D)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qs, ks).astype(jnp.float32) * sm_scale
    scores = scores + bias[:, None, None, :].astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, vs).reshape(B, L, HD)
    c_i8, sc = quantize_rows(ctx.astype(jnp.float32))
    wo_i8, so = quantize_weight(wo)
    acc = jax.lax.dot_general(
        c_i8.reshape(B * L, HD), wo_i8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).reshape(B, L, HD)
    y = x_f32 + acc.astype(jnp.float32) * sc * so[None, None, :] + bo.astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    yc = y - mu
    var = jnp.mean(yc * yc, axis=-1, keepdims=True)
    norm = yc * jax.lax.rsqrt(var + ln_eps)
    return (norm * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(x.dtype)


def attn_supports(dtype, seq_len: int, hidden: int, num_heads: int) -> bool:
    # Same VMEM accounting as ops/attention_block.py::supports, with the
    # resident weights at int8 (half bf16) footprint, PLUS the in-kernel
    # temporaries _attn_kernel materializes outside the declared scratch
    # (ADVICE r4): the f32/int32 QKV projection accumulator (L, 3H) and
    # the f32 x/y rows with their int8 twins (L, H). This rejects
    # L=256/H=768 (~15.9MB > 14MB budget) — validated on-chip in r5: a
    # compile probe of that shape did not finish Mosaic compilation within
    # 590s (only L=128 shapes are tested/measured); the XLA int8 composite
    # serves longer sequences.
    from .fused_attention import _head_group_size

    head_dim = hidden // num_heads
    G = _head_group_size(num_heads, seq_len)
    resident = 4 * hidden * hidden  # Wqkv + Wo, int8
    scratch = (
        seq_len * 3 * hidden * 2
        + G * seq_len * seq_len * (4 + 2)
        + seq_len * hidden * 2
    )
    temps = seq_len * 3 * hidden * (4 + 4) + seq_len * hidden * (4 + 4 + 1)
    io = 4 * seq_len * hidden * 2
    return (
        dtype == jnp.bfloat16
        and seq_len % 128 == 0
        and 128 <= seq_len <= 256
        and hidden % 128 == 0
        and head_dim * num_heads == hidden
        and head_dim % 8 == 0
        and resident + scratch + temps + io <= 14 * 1024 * 1024
    )


def supports(dtype, n_rows: int, hidden: int, intermediate: int) -> bool:
    # Resident int8 weights (H*Di bytes each) + double-buffered bf16 row
    # tiles + the in-kernel (_ROWS, Di) intermediates that _kernel
    # materializes between the two MXU dots: the f32 GELU input/output h
    # and the int32 acc1 (ADVICE r4 — these were omitted, letting
    # BERT-large shapes pass a budget they'd blow at Mosaic compile time).
    # The (_ROWS, H)-shaped f32/int8 temporaries (x, x_i8, y) are covered
    # by the headroom between this 15MB budget and v5e's ~16MB/core VMEM.
    # BERT-base (H=768, Di=3072): 4.7 + 1.5 + 6.3 = 12.5MB -> fits.
    # BERT-large (H=1024, Di=4096): 8.4 + 2.1 + 8.4 = 18.9MB -> rejected
    # (unmeasured on chip; only H<=768 shapes are tested/benched).
    resident = 2 * hidden * intermediate  # both weights, int8
    buffers = 2 * 2 * _ROWS * hidden * 2
    scratch = _ROWS * intermediate * (4 + 4)  # f32 h + int32 acc1
    return (
        dtype == jnp.bfloat16
        and n_rows % _ROWS == 0
        and n_rows >= 1024
        and hidden % 128 == 0
        and intermediate % 128 == 0
        and resident + buffers + scratch <= 15 * 1024 * 1024
    )
