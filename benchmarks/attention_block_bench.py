"""Microbench: fused attention SUBLAYER kernel vs the composite XLA path.

Compares ops/attention_block.py (QKV proj + MHA + out proj + residual +
LayerNorm in one kernel, weights VMEM-resident) against the identical-math
XLA composite, B=256 L=128 BERT-base shapes, LICM-proof scan chains.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from mdhs_tpu.ops.attention_block import attention_block, attention_block_reference

B, L, H, D = 256, 128, 12, 64
HD = H * D
K_STEPS = 20
SCALE = float(D) ** -0.5
EPS = 1e-12


def timeit(fn, *args, n=3):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(fn(*args))
    return (time.perf_counter() - t0) / n / K_STEPS * 1e3


def make_chain(op):
    @jax.jit
    def chain(x, wqkv, bqkv, wo, bo, gamma, beta, bias):
        def body(c, t):
            out = op(x + t.astype(x.dtype) * 1e-3, wqkv, bqkv, wo, bo, gamma, beta, bias)
            return c + out.astype(jnp.float32).sum(), None

        return jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(K_STEPS))[0]

    return chain


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, L, HD)), jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((HD, 3 * HD)) * 0.03, jnp.bfloat16)
    bqkv = jnp.asarray(rng.standard_normal(3 * HD) * 0.01, jnp.bfloat16)
    wo = jnp.asarray(rng.standard_normal((HD, HD)) * 0.03, jnp.bfloat16)
    bo = jnp.asarray(rng.standard_normal(HD) * 0.01, jnp.bfloat16)
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(HD), jnp.bfloat16)
    beta = jnp.asarray(0.1 * rng.standard_normal(HD), jnp.bfloat16)
    mask = np.ones((B, L), np.float32)
    mask[:, 100:] = 0.0
    bias = jnp.asarray((1.0 - mask) * -1e9, jnp.float32)

    args = (x, wqkv, bqkv, wo, bo, gamma, beta, bias)
    ref = attention_block_reference(*args, H, SCALE, EPS).astype(jnp.float32)
    out = attention_block(*args, H, SCALE, EPS).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(ref - out)))
    print(f"max |fused - ref| = {err:.3e}")

    xla_ms = timeit(make_chain(lambda *a: attention_block_reference(*a, H, SCALE, EPS)), *args)
    fused_ms = timeit(make_chain(lambda *a: attention_block(*a, H, SCALE, EPS)), *args)
    print(f"xla composite : {xla_ms:.3f} ms/layer")
    print(f"fused sublayer: {fused_ms:.3f} ms/layer  ({xla_ms / fused_ms:.2f}x)")


if __name__ == "__main__":
    main()
