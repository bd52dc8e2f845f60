"""One-HBM-pass BatchNorm statistics (Pallas TPU kernel).

Training-mode BatchNorm (models/norm.py::TorchBatchNorm, the torch-parity
BN used by every CNN tower — reference torchvision ResNet/ConvNeXt,
mibf_net/model_resnet.py:15) needs per-channel mean and biased variance of
a (B, H, W, C) activation. The XLA two-pass formulation

    mu  = mean(x);  var = mean((x - mu)^2)

reads x from HBM twice (the second pass depends on the first reduction, so
XLA cannot fuse them), and the E[x^2]-mu^2 one-pass rewrite is off the
table: its cancellation noise measurably corrupts gradients through deep
BN stacks (~2% at the resnet50 stem, see models/norm.py).

This kernel reads x ONCE: each grid step loads a row block into VMEM,
computes the block's own mean/M2 (a local two-pass, cancellation-free,
entirely in VMEM), and merges it into running accumulators with Chan's
parallel-variance combine

    delta = m_b - m_a
    m     = m_a + delta * n_b / (n_a + n_b)
    M2    = M2_a + M2_b + delta^2 * n_a * n_b / (n_a + n_b)

which is numerically equivalent to the two-pass result (f32 accumulators,
error ~1 ulp — torch's own CUDA BN uses the same Welford/Chan family).
At ResNet50 batch-128 shapes the saved pass is ~2.4 GB of HBM traffic per
training step.

Autodiff: custom VJP. d mean / dx = 1/N and d var / dx = 2 (x - mu) / N,
expressed as XLA ops (the backward reads x once either way, identical to
the two-pass formulation's backward).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bn_stats", "bn_stats_reference", "supports", "use_kernel"]

_VMEM_BLOCK_ELEMS = 1 << 19  # 512k elements/block: <=2MB bf16 in, 2MB f32 local
_INTERPRET = False  # tests: run the kernel in Pallas interpret mode on CPU
# Production gate (consulted by models/norm.py via use_kernel()).
# MEASURED (v5e, benchmarks/bn_stats_check.py, round 4): the kernel is
# numerically right (<=2.4e-5 vs two-pass) but SLOWER than XLA's two-pass
# at every ResNet50 batch-128 shape (0.44x at the stem, 0.76-0.96x
# elsewhere) — XLA keeps these reductions fused with the producing conv,
# so the "saved HBM pass" never existed on the real schedule. The gate
# therefore stays OFF in production; the kernel remains as a tested
# reference for shapes where the producer cannot fuse (e.g. BN directly
# on a loader output). NOTE: single-device scope only — under a data-sharded jit mesh,
# GSPMD treats the pallas_call as replicated and would all-gather the BN
# input (far exceeding the saved HBM pass); the trainer-side knob must not
# enable it when mesh.size > 1 (a shard_map wrapper with a psum'd Chan
# combine is the multi-device path if ever needed).
# MDHS_BN_STATS_KERNEL=1 flips the default at import (expert/bench knob —
# the single-device caveat above applies; benchmarks A/B it via env).
ENABLED = os.environ.get("MDHS_BN_STATS_KERNEL", "0") == "1"


def use_kernel(x_shape, dtype) -> bool:
    """The full production gate: ENABLED flag, a backend that can run the
    kernel (real TPU, or any backend in interpret mode so tests exercise
    the same routing), and shape eligibility."""
    if not ENABLED:
        return False
    if not (_INTERPRET or jax.default_backend() == "tpu"):
        return False
    # Single-device scope only (see module comment): under a >1-device
    # data-sharded mesh GSPMD treats the pallas_call as replicated and
    # all-gathers the BN input — far worse than the saved HBM pass. Hard
    # guard here so the env knob cannot regress multi-chip training.
    if len(jax.devices()) > 1 or jax.process_count() > 1:
        return False
    return supports(x_shape, dtype)


def _row_block(n_rows: int, cols: int) -> int:
    """Largest divisor of n_rows that is a multiple of 8 and keeps the
    block under the VMEM budget (0 if none exists). O(sqrt(n)) divisor
    enumeration — this runs at trace time on a 1-CPU host, so a linear
    scan over candidate blocks (~200k iterations for a ResNet50 stem
    activation) is too slow."""
    cap = max(8, _VMEM_BLOCK_ELEMS // max(cols, 1))
    cap = min(cap, n_rows)
    best = 0
    d = 1
    while d * d <= n_rows:
        if n_rows % d == 0:
            for r in (d, n_rows // d):
                if r % 8 == 0 and r <= cap and r > best:
                    best = r
        d += 1
    return best


def _kernel(x_ref, mean_ref, var_ref, acc_mean, acc_m2, *, rb: int, n_total: int):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)  # (RB, C)
    m_b = jnp.mean(x, axis=0, keepdims=True)  # (1, C)
    d = x - m_b
    m2_b = jnp.sum(d * d, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _init():
        acc_mean[...] = m_b
        acc_m2[...] = m2_b

    @pl.when(i > 0)
    def _combine():
        n_a = (i * rb).astype(jnp.float32)
        n_b = jnp.float32(rb)
        tot = n_a + n_b
        delta = m_b - acc_mean[...]
        acc_mean[...] = acc_mean[...] + delta * (n_b / tot)
        acc_m2[...] = acc_m2[...] + m2_b + delta * delta * (n_a * n_b / tot)

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        mean_ref[...] = acc_mean[...]
        var_ref[...] = acc_m2[...] / jnp.float32(n_total)


def _impl(x2d):
    R, C = x2d.shape
    rb = _row_block(R, C)
    if rb == 0:
        raise ValueError(
            f"bn_stats: row count {R} has no multiple-of-8 block divisor "
            f"under the VMEM budget (cols={C}); gate callers on supports()"
        )
    kernel = functools.partial(_kernel, rb=rb, n_total=R)
    mean, var = pl.pallas_call(
        kernel,
        grid=(R // rb,),
        in_specs=[pl.BlockSpec((rb, C), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, C), jnp.float32),
            pltpu.VMEM((1, C), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * R * C,
            bytes_accessed=R * C * x2d.dtype.itemsize + 8 * C,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(x2d)
    return mean[0], var[0]


def bn_stats_reference(x):
    """XLA two-pass reference: exactly models/norm.py's formulation."""
    x32 = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x32, axis=axes)
    var = jnp.mean(jnp.square(x32 - mean), axis=axes)
    return mean, var


@jax.custom_vjp
def bn_stats(x):
    """Per-channel (mean, biased var) over all leading axes of x.

    x: (..., C) bf16/f32. Returns f32 (C,), (C,). Numerics: Chan-combined
    block statistics, ~1 ulp from the two-pass result (NOT the
    cancellation-prone E[x^2]-mu^2 form).
    """
    x2d = x.reshape(-1, x.shape[-1])
    return _impl(x2d)


def _fwd(x):
    out = bn_stats(x)
    return out, (x, out[0])


def _bwd(res, cts):
    # Analytic BN-stats backward (torch's formulation). XLA autodiff of the
    # two-pass reference additionally materializes a sum(x - mu) correction
    # term that is analytically zero (fp-noise-level difference, below the
    # BN+ReLU gradient noise floor documented in test_train_step_parity).
    x, mean = res
    dmean, dvar = cts
    n = x.size // x.shape[-1]
    shape = (1,) * (x.ndim - 1) + (x.shape[-1],)
    dx = (
        dmean.reshape(shape) / n
        + dvar.reshape(shape) * 2.0 * (x.astype(jnp.float32) - mean.reshape(shape)) / n
    )
    return (dx.astype(x.dtype),)


bn_stats.defvjp(_fwd, _bwd)


def supports(x_shape, dtype) -> bool:
    """Kernel-eligibility gate: big-enough 2-D-reshapeable activations whose
    row count admits an 8-multiple block divisor, lane dim a multiple of
    hardware-friendly widths. Everything else takes the XLA reference."""
    if len(x_shape) < 2:
        return False
    cols = x_shape[-1]
    rows = 1
    for s in x_shape[:-1]:
        rows *= s
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    if cols % 64 != 0 or cols > 4096:
        return False
    if rows * cols < (1 << 20):  # small tensors: pass savings < call overhead
        return False
    return _row_block(rows, cols) >= 8
