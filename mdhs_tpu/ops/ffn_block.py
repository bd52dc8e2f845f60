"""Fused BERT FFN sublayer (Pallas TPU kernel).

Per row-block of the flattened (B*L, H) hidden states:

    h   = gelu(x @ W1 + b1)          (erf-GELU via the poly-tanh form)
    out = LayerNorm(x + h @ W2 + b2)

The (B, L, 4H) intermediate — ~400 MB of bf16 HBM traffic per BERT-base
layer at batch 256 — never leaves VMEM; W1/W2 stay resident across grid
steps (constant index_map). GELU uses the same degree-4 poly-tanh erf form
as ops/gelu.py (see there for the accuracy analysis), evaluated on the f32
matmul accumulator before the bf16 cast — one fewer rounding than the
unfused path.

Companion to ops/attention_block.py; together a BertLayer is two Pallas
calls. Custom VJP recomputes the XLA reference for autodiff. Reference
parity anchor: HF BertIntermediate + BertOutput (consumed via reference
encoder.py:112-134).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gelu import _GELU_P

__all__ = ["ffn_block", "ffn_block_reference", "supports"]

_ROWS = 128  # rows per grid step; (128, 4H) f32 scratch keeps VMEM ~12.5MB


def _gelu_poly_f32(x):
    t = x * x
    p = jnp.float32(_GELU_P[4])
    for a in _GELU_P[3::-1]:
        p = p * t + jnp.float32(a)
    return jnp.float32(0.5) * x * (jnp.float32(1.0) + jnp.tanh(x * p))


def _gelu_tanh_f32(x):
    """tanh-approximate GELU (the fast_math serving preset's function)."""
    c0 = jnp.float32(0.7978845608028654)  # sqrt(2/pi)
    c1 = jnp.float32(0.044715)
    inner = c0 * (x + c1 * x * x * x)
    return jnp.float32(0.5) * x * (jnp.float32(1.0) + jnp.tanh(inner))


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, gamma_ref, beta_ref,
            out_ref, inter_ref, *, ln_eps: float, act: str):
    x = x_ref[:]  # (R, H) bf16
    h = jax.lax.dot_general(
        x, w1_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    h = h + b1_ref[0:1, :]
    h = _gelu_tanh_f32(h) if act == "tanh" else _gelu_poly_f32(h)
    inter_ref[:] = h.astype(inter_ref.dtype)
    h2 = jax.lax.dot_general(
        inter_ref[:], w2_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    y = x.astype(jnp.float32) + h2 + b2_ref[0:1, :]
    mu = jnp.mean(y, axis=-1, keepdims=True)
    yc = y - mu
    var = jnp.mean(yc * yc, axis=-1, keepdims=True)
    norm = yc * jax.lax.rsqrt(var + ln_eps)
    out_ref[:] = (norm * gamma_ref[0:1, :] + beta_ref[0:1, :]).astype(out_ref.dtype)


def _impl(x2d, w1, b1, w2, b2, gamma, beta, ln_eps, act):
    N, H = x2d.shape
    Di = w1.shape[1]
    kernel = functools.partial(_kernel, ln_eps=ln_eps, act=act)
    row_spec = pl.BlockSpec((_ROWS, H), lambda r: (r, 0), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda r: (0,) * len(shape), memory_space=pltpu.VMEM)
    with jax.default_matmul_precision("default"):
        return pl.pallas_call(
            kernel,
            grid=(N // _ROWS,),
            in_specs=[
                row_spec,
                const((H, Di)),
                const((1, Di)),
                const((Di, H)),
                const((1, H)),
                const((1, H)),
                const((1, H)),
            ],
            out_specs=row_spec,
            out_shape=jax.ShapeDtypeStruct((N, H), x2d.dtype),
            scratch_shapes=[pltpu.VMEM((_ROWS, Di), x2d.dtype)],
            cost_estimate=pl.CostEstimate(
                flops=4 * N * H * Di,
                bytes_accessed=2 * N * H * x2d.dtype.itemsize + 4 * H * Di,
                transcendentals=N * Di,
            ),
        )(x2d, w1, b1.reshape(1, Di), w2, b2.reshape(1, H),
          gamma.reshape(1, H), beta.reshape(1, H))


def ffn_block_reference(x2d, w1, b1, w2, b2, gamma, beta, ln_eps, act="erf"):
    """XLA reference (same math; GELU in f32 on the pre-activation)."""
    h = (jnp.dot(x2d, w1) + b1).astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=(act == "tanh")).astype(x2d.dtype)
    y = (x2d + (jnp.dot(h, w2) + b2)).astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    yc = y - mu
    var = jnp.mean(yc * yc, axis=-1, keepdims=True)
    norm = yc * jax.lax.rsqrt(var + ln_eps)
    return (norm * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(x2d.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def ffn_block(x2d, w1, b1, w2, b2, gamma, beta, ln_eps: float, act: str = "erf"):
    """Fused FFN sublayer on (N, H) rows. act: "erf" (poly-tanh exact form)
    or "tanh" (fast_math serving preset). See module docstring."""
    return _impl(x2d, w1, b1, w2, b2, gamma, beta, ln_eps, act)


def _fwd(x2d, w1, b1, w2, b2, gamma, beta, ln_eps, act):
    return _impl(x2d, w1, b1, w2, b2, gamma, beta, ln_eps, act), (x2d, w1, b1, w2, b2, gamma, beta)


def _bwd(ln_eps, act, res, g):
    x2d, w1, b1, w2, b2, gamma, beta = res
    _, vjp = jax.vjp(lambda *a: ffn_block_reference(*a, ln_eps, act), x2d, w1, b1, w2, b2, gamma, beta)
    return vjp(g)


ffn_block.defvjp(_fwd, _bwd)


def supports(dtype, n_rows: int, hidden: int, intermediate: int) -> bool:
    # Resident footprint: W1+W2 (2*H*Di bf16, constant index_map) + the
    # (_ROWS, Di) h-scratch + double-buffered x/y row tiles must fit VMEM.
    # Gating on the actual bytes (not just Di) keeps BERT-large shapes
    # (H=1024, Di=4096: ~16.8MB weights alone) on the XLA fallback instead
    # of failing Mosaic compilation at runtime; H=768/Di=4096 (14.4MB,
    # measured to fit) stays on the kernel.
    resident = 2 * hidden * intermediate * 2  # both weights, bf16
    scratch = _ROWS * intermediate * 2 + 2 * 2 * _ROWS * hidden * 2
    return (
        dtype == jnp.bfloat16
        and n_rows % _ROWS == 0
        # small-batch predict (few grid steps) can't pipeline the resident
        # weight DMAs — measured slower than XLA at batch 1; keep the kernel
        # for throughput-shaped calls only
        and n_rows >= 1024
        and hidden % 128 == 0
        and intermediate % 128 == 0
        and resident + scratch <= 15 * 1024 * 1024
    )
