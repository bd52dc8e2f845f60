"""Microbench: fused short-seq attention kernel vs exact XLA einsum path.

Run on the real TPU chip (PYTHONPATH must keep the axon plugin dir).
Iterations chained in one lax.scan with loop-variant inputs (CLAUDE.md:
defeat LICM), hard host fetch between timed calls.

Measured v5e (B=256 L=128 H=12 D=64 bf16): fused 1.10x XLA exact.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from mdhs_tpu.ops.fused_attention import attention_reference, fused_attention

B, L, H, D = 256, 128, 12, 64
HD = H * D
K_STEPS = 20
SCALE = float(D) ** -0.5


def timeit(fn, *args, n=3):
    np.asarray(fn(*args))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(fn(*args))
    return (time.perf_counter() - t0) / n / K_STEPS * 1e3  # ms per op


def make_chain(op):
    @jax.jit
    def chain(q, k, v, bias):
        def body(carry, t):
            qq = q + t.astype(q.dtype) * 1e-3
            out = op(qq, k, v, bias)
            return carry + out.astype(jnp.float32).sum(), None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(K_STEPS))
        return c

    return chain


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, L, HD)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, L, HD)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, L, HD)), jnp.bfloat16)
    mask = np.ones((B, L), np.float32)
    mask[:, 100:] = 0.0  # padded tail
    bias = jnp.asarray((1.0 - mask) * -1e9, jnp.float32)

    ref = attention_reference(q, k, v, bias, H, SCALE).astype(jnp.float32)
    out = fused_attention(q, k, v, bias, H, SCALE).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(ref - out)))
    print(f"max |fused - ref| = {err:.3e}")
    assert err < 3e-2, "kernel numerics mismatch"  # ~2 bf16 ulps at |x|~1

    xla_ms = timeit(make_chain(lambda *a: attention_reference(*a, H, SCALE)), q, k, v, bias)
    fused_ms = timeit(make_chain(lambda *a: fused_attention(*a, H, SCALE)), q, k, v, bias)
    print(f"B={B} L={L} H={H} D={D}")
    print(f"xla exact : {xla_ms:.3f} ms/op")
    print(f"fused     : {fused_ms:.3f} ms/op  ({xla_ms / fused_ms:.2f}x)")


if __name__ == "__main__":
    main()
