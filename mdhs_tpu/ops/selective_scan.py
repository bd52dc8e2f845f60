"""Selective-scan (Mamba recurrence) for TPU.

Replaces the reference's only custom GPU kernel dependency
(`mamba_ssm.selective_scan_fn`, reached via modules/fusion_blocks.py:268,
ConNexT/models/block/len4mamba.py:5, mamba_vision.py:1621-1631).

The recurrence, per batch b and channel d with state size N:

    h_t = exp(dt_t * A) * h_{t-1} + (dt_t * x_t) * B_t        (h in R^N)
    y_t = <C_t, h_t> + D_skip * x_t

Two implementations:

1. ``selective_scan_ref`` — `jax.lax.associative_scan` formulation
   (first-order linear recurrences compose associatively as
   (a2, b2) ∘ (a1, b1) = (a2*a1, a2*b1 + b2)). Differentiable, runs on any
   backend; O(L log L) work but fully parallel.

2. Pallas TPU kernel — grid over (batch, channel-blocks), sequential
   fori_loop over time inside the kernel with (N, BLOCK_D) f32 VPU tiles
   (channels ride the 128-wide lane dim). State stays in registers/VMEM;
   one pass over HBM.

``selective_scan`` is the public entry: Pallas forward on TPU with a custom
VJP that rematerializes through the associative-scan formulation for the
backward pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_D = 128


def selective_scan_ref(x, dt, A, B, C, D_skip):
    """Associative-scan reference implementation.

    Args:
      x:  (batch, L, D) input sequence
      dt: (batch, L, D) positive step sizes (already softplus'd + biased)
      A:  (D, N) state matrix (negative real parts)
      B:  (batch, L, N) input projections
      C:  (batch, L, N) output projections
      D_skip: (D,) skip connection
    Returns:
      y: (batch, L, D)
    """
    f32 = jnp.float32
    x32, dt32 = x.astype(f32), dt.astype(f32)
    A32, B32, C32 = A.astype(f32), B.astype(f32), C.astype(f32)
    da = jnp.exp(dt32[..., None] * A32[None, None])          # (B, L, D, N)
    db = (dt32 * x32)[..., None] * B32[..., None, :]          # (B, L, D, N)

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_r * a_l, a_r * b_l + b_r

    _, h = jax.lax.associative_scan(combine, (da, db), axis=1)
    y = jnp.einsum("bldn,bln->bld", h, C32)
    y = y + x32 * D_skip.astype(f32)[None, None]
    return y.astype(x.dtype)


def _scan_kernel(x_ref, dt_ref, a_ref, b_ref, c_ref, dskip_ref, y_ref):
    """One (batch, channel-block) program: sequential scan over L.

    Block shapes (VMEM):
      x_ref, dt_ref, y_ref: (1, L, BLOCK_D)
      a_ref:                (N, BLOCK_D)  -- A transposed, channels on lanes
      b_ref, c_ref:         (1, L, N)
      dskip_ref:            (1, BLOCK_D)
    """
    L = x_ref.shape[1]
    N = a_ref.shape[0]
    a_t = a_ref[:].astype(jnp.float32)                        # (N, BLOCK_D)
    dskip = dskip_ref[0, :].astype(jnp.float32)               # (BLOCK_D,)

    def step(t, h):
        dt_t = dt_ref[0, t, :].astype(jnp.float32)            # (BLOCK_D,)
        x_t = x_ref[0, t, :].astype(jnp.float32)
        b_t = b_ref[0, t, :].astype(jnp.float32)              # (N,)
        c_t = c_ref[0, t, :].astype(jnp.float32)
        decay = jnp.exp(a_t * dt_t[None, :])                  # (N, BLOCK_D)
        drive = b_t[:, None] * (dt_t * x_t)[None, :]
        h = decay * h + drive
        y_t = jnp.sum(h * c_t[:, None], axis=0)               # (BLOCK_D,)
        y_ref[0, t, :] = (y_t + dskip * x_t).astype(y_ref.dtype)
        return h

    jax.lax.fori_loop(0, L, step, jnp.zeros((N, BLOCK_D), jnp.float32))


def _selective_scan_tpu(x, dt, A, B, C, D_skip):
    batch, L, D = x.shape
    N = A.shape[1]
    n_blocks = -(-D // BLOCK_D)
    Dp = n_blocks * BLOCK_D
    if Dp != D:
        pad = Dp - D
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
        dt = jnp.pad(dt, ((0, 0), (0, 0), (0, pad)), constant_values=1.0)
        A = jnp.pad(A, ((0, pad), (0, 0)))
        D_skip = jnp.pad(D_skip, (0, pad))

    y = pl.pallas_call(
        _scan_kernel,
        grid=(batch, n_blocks),
        in_specs=[
            pl.BlockSpec((1, L, BLOCK_D), lambda b, d: (b, 0, d), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, BLOCK_D), lambda b, d: (b, 0, d), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, BLOCK_D), lambda b, d: (0, d), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, N), lambda b, d: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, N), lambda b, d: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_D), lambda b, d: (0, d), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, L, BLOCK_D), lambda b, d: (b, 0, d), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, L, Dp), x.dtype),
    )(x, dt, A.T, B, C, D_skip[None, :])
    return y[..., :D] if Dp != D else y


@jax.custom_vjp
def selective_scan(x, dt, A, B, C, D_skip):
    """Selective scan: Pallas kernel on TPU, associative scan elsewhere."""
    if jax.default_backend() == "tpu":
        return _selective_scan_tpu(x, dt, A, B, C, D_skip)
    return selective_scan_ref(x, dt, A, B, C, D_skip)


def _fwd(x, dt, A, B, C, D_skip):
    return selective_scan(x, dt, A, B, C, D_skip), (x, dt, A, B, C, D_skip)


def _bwd(residuals, g):
    _, vjp = jax.vjp(selective_scan_ref, *residuals)
    return vjp(g)


selective_scan.defvjp(_fwd, _bwd)
