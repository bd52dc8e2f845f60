"""Pallas TPU kernel for per-row image shears (the 3-shear rotation core).

A shear shifts each row r of an image along the other axis by a
row-dependent subpixel offset d(r) (ops/augment.py::rotate_3shear — the
device-side replacement for torchvision RandomRotation,
/root/reference/data_loader.py:354). The XLA formulation (one dynamic
slice per row) issues B*C*H tiny gathers — measured ~100 ms of the ~119 ms
augmentation cost of a 128x224^2 training step, because each 900 B slice
pays full dispatch/DMA latency.

Kernel formulation: with integer shift s(r) = floor(d)+pad and fraction
f(r), the output is

    out[v, r] = (1-f_r) * x[v + s_r, r] + f_r * x[v + s_r + 1, r]
              = sum_k w_k(r) * x[v + k, r],
    w_k(r) = (1-f_r)*[s_r == k] + f_r*[s_r == k-1]

i.e. a sum over the STATIC shift range k in [0, 2*pad] of full-width
vector FMAs, where the shifted view x[k : k+W, :] is maintained in a VMEM
scratch rotated by a constant 1 sublane per iteration (Mosaic supports
neither loop-carried dynamic slices nor loop-carried dynamic rotates at
these widths — see _kernel) and w_k is a lane vector. No gathers, no
per-row work. The two nonzero terms are accumulated in the same order as
the lerp in the XLA path, so the kernel is bit-exact against it
(asserted in tests/test_ops_and_metrics.py).

Layout: shear axis on sublanes, row-index axis on lanes; the caller
transposes between the three shears (cheap XLA transposes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(n_shifts: int, out_w: int, s_ref, f_ref, x_ref, o_ref, cur_ref):
    """Blocks: s_ref (B, L) int32; f_ref (B, L) f32 (whole arrays — a
    (1, L) block would violate Mosaic's sublane-divisibility rule for
    B > 1, so each grid step indexes its row dynamically);
    x_ref (1, 1, S, L) f32 with S = out_w + 2*pad; o_ref (1, 1, out_w, L).

    The shifted read x[v + k, :] comes from a scratch copy rotated by a
    STATIC -1 each iteration (cur[v] = x[v + k] at iteration k): Mosaic
    cannot statically prove 8-alignment of a loop-carried dynamic-slice
    offset at multi-tile widths, and tpu.dynamic_rotate with a
    loop-carried shift amount miscompiles at (264, 224)-shaped vectors
    (wrong values everywhere — measured, see git history), while a
    constant-shift rotate is exact. Rotation wraparound only enters
    sublanes >= S - k >= out_w, which the [:out_w] crop discards."""
    b = pl.program_id(0)
    s = s_ref[b, :]
    f = f_ref[b, :]
    cur_ref[...] = x_ref[0, 0, :, :]
    o_ref[0, 0, :, :] = jnp.zeros(o_ref.shape[2:], o_ref.dtype)

    def body(k, _):
        w = jnp.where(s == k, 1.0 - f, 0.0) + jnp.where(s == k - 1, f, 0.0)
        o_ref[0, 0, :, :] += w[None, :] * cur_ref[0:out_w, :]
        # roll by S-1 == -1 mod S (pltpu.roll requires non-negative shifts;
        # a dynamic negative shift is not rejected but wraps to garbage)
        cur_ref[...] = pltpu.roll(cur_ref[...], cur_ref.shape[0] - 1, axis=0)
        return 0

    jax.lax.fori_loop(0, n_shifts, body, 0)


@functools.partial(jax.jit, static_argnames=("pad",))
def shear_sublane(x, d, pad: int):
    """x: (B, C, S, L) f32 where S is the (already padded) shear axis and L
    the row-index axis; d: (B, L) f32 per-lane shifts in pixels. Returns
    (B, C, S - 2*pad, L): out[.., v, r] = x[.., v + pad + d[r], r] with
    bilinear interpolation (zero fill comes from the caller's padding).

    Matches ops/augment.py::_shear_w exactly: s = clip(pad + floor(d),
    0, 2*pad - 1), f = d - floor(d).
    """
    B, C, S, L = x.shape
    W = S - 2 * pad
    # tpu.dynamic_rotate requires an 8-aligned sublane count; trailing zeros
    # only ever rotate into the cropped region [W, S) so they are inert.
    if S % 8:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 8 - S % 8), (0, 0)))
        S = x.shape[2]
    d0 = jnp.floor(d)
    f = (d - d0).astype(jnp.float32)
    s = jnp.clip(pad + d0.astype(jnp.int32), 0, 2 * pad - 1)

    return pl.pallas_call(
        functools.partial(_kernel, 2 * pad + 1, W),
        grid=(B, C),
        in_specs=[
            pl.BlockSpec((B, L), lambda b, c: (0, 0)),
            pl.BlockSpec((B, L), lambda b, c: (0, 0)),
            pl.BlockSpec((1, 1, S, L), lambda b, c: (b, c, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, W, L), lambda b, c: (b, c, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, C, W, L), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, L), jnp.float32)],
    )(s, f, x.astype(jnp.float32))


def supports(backend: str, out_size: int, pad_x: int, pad_y: int) -> bool:
    # VMEM: one (S, L) f32 input plane + the rotating scratch copy +
    # output; S = out + 2*max_pad. 224 + 2*82 (45 deg) = 388 x 224 f32
    # = 348 KB x2 + 200 KB — far under budget for any realistic image
    # size; gate generously (factor 2 covers input+scratch).
    s_max = out_size + 2 * max(pad_x, pad_y)
    return backend == "tpu" and s_max * out_size * 4 * 2 < 8 * 1024 * 1024
