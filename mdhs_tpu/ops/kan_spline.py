"""Fused KAN layer forward (Pallas TPU kernel).

KANLinear's forward is y = silu(x) @ Wb^T + Bases(x) @ Ws^T where Bases
materializes a (batch, in, G+K) B-spline tensor — (G+K)x the size of the
activations. XLA materializes that tensor in HBM because dot operands
aren't producer-fused; this kernel computes the Cox–de Boor recursion in
VMEM as (TB, in) lane-major tiles (one array per coefficient — keeping the
feature axis on the 128-wide lanes) and feeds the MXU directly: per
coefficient j, one (TB, in) @ (in, TO) matmul accumulated into the output
block. One HBM pass over x; bases never leave VMEM.

Used by KANLinear (modules/kan.py) on TPU when shapes warrant; the jnp
reference path (`kan_forward_ref`) is the fallback and the backward pass
(custom VJP rematerializes through it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB = 128  # batch tile
TO = 128  # output-feature tile


def kan_forward_ref(x, grid, base_w, spline_w, spline_order: int):
    """jnp reference: silu(x) @ base_w^T + bases @ spline_w^T.

    x: (B, in); grid: (in, n_pts); base_w: (out, in);
    spline_w: (out, in, n_coeff) [already scaled].
    """
    from ..modules.kan import b_splines

    x32 = x.astype(jnp.float32)
    base = jax.nn.silu(x32) @ base_w.astype(jnp.float32).T
    bases = b_splines(x32, grid, spline_order)  # (B, in, n_coeff)
    spline = bases.reshape(x.shape[0], -1) @ spline_w.astype(jnp.float32).reshape(
        spline_w.shape[0], -1
    ).T
    return (base + spline).astype(x.dtype)


def _kernel(spline_order: int, n_pts: int,
            x_ref, grid_ref, bw_ref, sw_ref, y_ref):
    """Block shapes:
      x_ref: (TB, IN)            grid_ref: (n_pts, IN)
      bw_ref: (IN, TO)           sw_ref: (n_coeff, IN, TO)
      y_ref: (TB, TO)
    """
    x = x_ref[:].astype(jnp.float32)  # (TB, IN)
    # zeroth-order bases: indicator of grid interval, one (TB, IN) tile each
    g = [grid_ref[j, :].astype(jnp.float32)[None, :] for j in range(n_pts)]
    bases = [
        ((x >= g[j]) & (x < g[j + 1])).astype(jnp.float32)
        for j in range(n_pts - 1)
    ]
    # Cox-de Boor recursion, lane-major
    for k in range(1, spline_order + 1):
        nxt = []
        for j in range(len(bases) - 1):
            denom_l = g[j + k] - g[j]
            denom_r = g[j + k + 1] - g[j + 1]
            left = (x - g[j]) / jnp.where(denom_l == 0, 1.0, denom_l)
            right = (g[j + k + 1] - x) / jnp.where(denom_r == 0, 1.0, denom_r)
            nxt.append(left * bases[j] + right * bases[j + 1])
        bases = nxt

    acc = jnp.dot(
        jax.nn.silu(x), bw_ref[:].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    for j, b in enumerate(bases):
        acc = acc + jnp.dot(
            b, sw_ref[j, :, :].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
    y_ref[:] = acc.astype(y_ref.dtype)


def _pad_axis(a, axis, mult):
    size = a.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return a, size
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths), size


def _kan_forward_pallas(x, grid, base_w, spline_w, spline_order: int):
    B, IN = x.shape
    OUT = base_w.shape[0]
    n_pts = grid.shape[1]
    n_coeff = spline_w.shape[2]

    x_p, _ = _pad_axis(x, 0, TB)
    Bp = x_p.shape[0]
    # transpose weights to (IN, OUT) / (n_coeff, IN, OUT) and pad OUT
    bw = base_w.T  # (IN, OUT)
    sw = jnp.transpose(spline_w, (2, 1, 0))  # (n_coeff, IN, OUT)
    bw, _ = _pad_axis(bw, 1, TO)
    sw, _ = _pad_axis(sw, 2, TO)
    OUTp = bw.shape[1]
    grid_t = grid.T  # (n_pts, IN)

    kernel = functools.partial(_kernel, spline_order, n_pts)
    # Grid order (out, batch): the batch axis iterates fastest, so the
    # weight blocks' indices are unchanged between consecutive programs and
    # Pallas keeps them resident in VMEM instead of re-fetching per tile.
    y = pl.pallas_call(
        kernel,
        grid=(OUTp // TO, Bp // TB),
        in_specs=[
            pl.BlockSpec((TB, IN), lambda o, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pts, IN), lambda o, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((IN, TO), lambda o, b: (0, o), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (n_coeff, IN, TO), lambda o, b: (0, 0, o), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((TB, TO), lambda o, b: (b, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, OUTp), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * IN * OUTp * (n_coeff + 1),
            bytes_accessed=4 * (Bp * IN + IN * OUTp * (n_coeff + 1) + Bp * OUTp),
            transcendentals=Bp * IN,
        ),
    )(x_p, grid_t, bw, sw)
    return y[:B, :OUT]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def kan_forward(x, grid, base_w, spline_w, spline_order: int = 3):
    """Fused KAN forward: Pallas on TPU, jnp reference elsewhere."""
    if jax.default_backend() == "tpu" and x.shape[0] * base_w.shape[0] >= 4096:
        return _kan_forward_pallas(x, grid, base_w, spline_w, spline_order)
    return kan_forward_ref(x, grid, base_w, spline_w, spline_order)


def _fwd(x, grid, base_w, spline_w, spline_order):
    return kan_forward(x, grid, base_w, spline_w, spline_order), (
        x, grid, base_w, spline_w,
    )


def _bwd(spline_order, residuals, g):
    x, grid, base_w, spline_w = residuals
    _, vjp = jax.vjp(
        lambda a, b, c: kan_forward_ref(a, grid, b, c, spline_order),
        x, base_w, spline_w,
    )
    dx, dbw, dsw = vjp(g)
    return dx, None, dbw, dsw


kan_forward.defvjp(_fwd, _bwd)
