"""Diagnostic: where does the fused attention kernel's time go?

Variants that each remove one stage (WRONG numerics — timing only):
  full     — the production kernel path
  nomax    — softmax without the max pass
  nosmax   — no softmax at all (probs = scores cast)
  nopv     — no PV matmul (write probs slice)
  aligned  — all head slices read at offset 0 (measures 64-lane slice cost)
Run on the real chip with PYTHONPATH including the axon plugin dir.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, L, H, D = 256, 128, 12, 64
HD = H * D
K_STEPS = 20
SCALE = float(D) ** -0.5


def make_kernel(mode):
    def kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, scores_ref, probs_ref):
        for h in range(H):
            lo = 0 if mode == "aligned" else h * D
            scores_ref[h * L : (h + 1) * L, :] = jax.lax.dot_general(
                q_ref[0, :, lo : lo + D],
                k_ref[0, :, lo : lo + D],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        s = scores_ref[:] * SCALE + bias_ref[0, 0:1, :]
        if mode == "nosmax":
            probs_ref[:] = s.astype(probs_ref.dtype)
        elif mode == "nomax":
            p = jnp.exp(s)
            probs_ref[:] = (p * pl.reciprocal(jnp.sum(p, axis=-1, keepdims=True), approx=False)).astype(probs_ref.dtype)
        else:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            probs_ref[:] = (p * pl.reciprocal(jnp.sum(p, axis=-1, keepdims=True), approx=False)).astype(probs_ref.dtype)
        for h in range(H):
            lo = 0 if mode == "aligned" else h * D
            if mode == "nopv":
                out_ref[0, :, lo : lo + D] = probs_ref[h * L : (h + 1) * L, 0:D].astype(out_ref.dtype)
            else:
                out_ref[0, :, lo : lo + D] = jnp.dot(
                    probs_ref[h * L : (h + 1) * L, :],
                    v_ref[0, :, lo : lo + D],
                    preferred_element_type=jnp.float32,
                ).astype(out_ref.dtype)

    return kernel


def build(mode):
    row_spec = pl.BlockSpec((1, L, HD), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)

    def op(q, k, v, bias):
        with jax.default_matmul_precision("default"):
            return pl.pallas_call(
                make_kernel(mode),
                grid=(B,),
                in_specs=[row_spec, row_spec, row_spec, bias_spec],
                out_specs=row_spec,
                out_shape=jax.ShapeDtypeStruct((B, L, HD), q.dtype),
                scratch_shapes=[
                    pltpu.VMEM((H * L, L), jnp.float32),
                    pltpu.VMEM((H * L, L), q.dtype),
                ],
            )(q, k, v, bias.reshape(B, 1, L))

    @jax.jit
    def chain(q, k, v, bias):
        def body(c, t):
            out = op(q + t.astype(q.dtype) * 1e-3, k, v, bias)
            return c + out.astype(jnp.float32).sum(), None

        return jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(K_STEPS))[0]

    return chain


def timeit(fn, *args, n=3):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(fn(*args))
    return (time.perf_counter() - t0) / n / K_STEPS * 1e3


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, L, HD)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, L, HD)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, L, HD)), jnp.bfloat16)
    bias = jnp.zeros((B, L), jnp.float32)
    for mode in ("full", "nomax", "nosmax", "nopv", "aligned"):
        ms = timeit(build(mode), q, k, v, bias)
        print(f"{mode:8s}: {ms:.3f} ms/op", flush=True)


if __name__ == "__main__":
    main()
