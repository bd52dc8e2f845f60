"""Dynamic int8 quantized matmul for the serving path.

TPU v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 FLOP rate
(394 TOPS vs 197 TFLOPS). This module implements the standard
dynamic-quant recipe (per-output-channel weight scales + per-row
activation scales):

    w_i8[k, n]  = round(w[k, n] / sw[n]),   sw[n] = max_k |w[k, n]| / 127
    x_i8[m, k]  = round(x[m, k] / sx[m]),   sx[m] = max_k |x[m, k]| / 127
    y[m, n]     = (x_i8 @ w_i8)_int32 * sx[m] * sw[n] + b[n]

Used by the opt-in `quantize="int8"` preset on the BERT tower
(models/bert.py), OFF by default; the scored bench path stays
exact-parity bf16. There is no reference counterpart (the reference
serves fp32 torch).

MEASURED (v5e, BERT-base B=128 L=128, 2026-08-19): this XLA-level a8w8
composite is SLOWER than the default bf16 serving path — 26.5 ms/iter
vs 19.5 ms (fused Pallas sublayers). The unfused per-matmul
activation-quantize passes (~25 MB read + 12 MB write each, 72
matmuls) cost more HBM time than the 2x MXU rate saves at these
shapes. The fused Pallas sublayer kernels in ops/quant_kernel.py fix
exactly that (quantize the x tile in VMEM, int8 MXU dot, rescale in
the epilogue): with them the int8 preset runs 17.3 ms/iter vs 21.7 ms
bf16 (1.26x). models/bert.py routes to the kernels on supported
TPU shapes and falls back to this module elsewhere. Logit drift (CLS
mean |d| 2.4e-2 on scale 0.79, ~5x the bf16 noise floor) is recorded
in docs/PARITY.md ("int8 serving preset"); reproduce both numbers
with benchmarks/fast_math_drift.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["quantize_weight", "quantize_rows", "int8_dense"]


def quantize_weight(w: jnp.ndarray):
    """Per-output-channel symmetric absmax quantization of a (K, N) weight.

    Returns (w_i8 int8 (K, N), scale f32 (N,)). Computed at trace time from
    the f32 params; under jit the quantized weight is re-derived per call
    (weights are inputs, not constants), which costs one read of the weight
    — negligible next to the activation matmuls at serving batch sizes.
    """
    w = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    w_i8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_i8, scale


def quantize_rows(x: jnp.ndarray):
    """Per-row symmetric absmax quantization of (..., K) activations.

    Returns (x_i8 int8, scale f32 (..., 1)). Per-row (per-token) scales are
    markedly more accurate than per-tensor for transformer hidden states
    (outlier tokens) at identical matmul cost — the scale folds into the
    row rescale after the int32 accumulation.
    """
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    x_i8 = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return x_i8.astype(jnp.int8), scale


def int8_dense(x: jnp.ndarray, kernel: jnp.ndarray, bias=None,
               out_dtype=jnp.bfloat16):
    """a8w8 dense: quantize x per row and kernel per column, matmul on the
    int8 MXU (int32 accumulation), rescale, add bias.

    x: (..., K) bf16/f32; kernel: (K, N) f32 param; bias: (N,) or None.
    """
    w_i8, sw = quantize_weight(kernel)
    x_i8, sx = quantize_rows(x)
    lead = x_i8.shape[:-1]
    k = x_i8.shape[-1]
    acc = jax.lax.dot_general(
        x_i8.reshape(-1, k), w_i8,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx.reshape(-1, 1) * sw[None, :]
    if bias is not None:
        y = y + bias.astype(jnp.float32)[None, :]
    return y.reshape(*lead, -1).astype(out_dtype)
