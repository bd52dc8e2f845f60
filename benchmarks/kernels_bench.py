#!/usr/bin/env python
"""Microbenchmarks: Pallas kernels vs their XLA reference formulations.

Methodology: K iterations chained inside ONE jitted lax.scan with a
data dependence on the loop index (defeats loop-invariant code motion) and
a scalar carry (defeats DCE); hard host fetch between timed calls. This
measures sustained device time, not dispatch overhead.

Run on TPU:  PYTHONPATH=. python benchmarks/kernels_bench.py
Prints JSON lines {kernel, pallas_ms, xla_ms, speedup}.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

K_STEPS = 50
N_TIMED = 3


def timed_chain(fn, x, *rest):
    """fn(x, *rest) -> array. Returns sustained ms per call."""

    @jax.jit
    def chain(x, *rest):
        def body(c, t):
            out = fn(x + (t * 1e-6).astype(x.dtype), *rest)
            return c + out.sum().astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(K_STEPS))
        return c

    np.asarray(chain(x, *rest))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(N_TIMED):
        np.asarray(chain(x, *rest))
    return (time.perf_counter() - t0) / (N_TIMED * K_STEPS) * 1000


def bench_selective_scan():
    from mdhs_tpu.ops.selective_scan import _selective_scan_tpu, selective_scan_ref

    B, L, D, N = 64, 64, 512, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (B, L, D))
    dt = jax.nn.softplus(jax.random.normal(ks[1], (B, L, D)))
    A = -jnp.exp(jax.random.normal(ks[2], (D, N)))
    Bm = jax.random.normal(ks[3], (B, L, N))
    Cm = jax.random.normal(ks[4], (B, L, N))
    Ds = jax.random.normal(ks[5], (D,))
    pl_ms = timed_chain(_selective_scan_tpu, x, dt, A, Bm, Cm, Ds)
    xla_ms = timed_chain(selective_scan_ref, x, dt, A, Bm, Cm, Ds)
    print(json.dumps({
        "kernel": f"selective_scan B{B} L{L} D{D} N{N}",
        "pallas_ms": round(pl_ms, 4), "xla_ms": round(xla_ms, 4),
        "speedup": round(xla_ms / pl_ms, 2),
    }))


def bench_kan_forward():
    from mdhs_tpu.modules.kan import make_grid
    from mdhs_tpu.ops.kan_spline import _kan_forward_pallas, kan_forward_ref

    B, IN, OUT, G, K = 4096, 768, 512, 5, 3
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(ks[0], (B, IN)) * 0.7
    grid = make_grid(IN, G, K)
    bw = jax.random.normal(ks[1], (OUT, IN)) * 0.1
    sw = jax.random.normal(ks[2], (OUT, IN, G + K)) * 0.1
    pl_ms = timed_chain(lambda x, g, b, s: _kan_forward_pallas(x, g, b, s, K),
                        x, grid, bw, sw)
    xla_ms = timed_chain(lambda x, g, b, s: kan_forward_ref(x, g, b, s, K),
                         x, grid, bw, sw)
    print(json.dumps({
        "kernel": f"kan_forward B{B} in{IN} out{OUT}",
        "pallas_ms": round(pl_ms, 4), "xla_ms": round(xla_ms, 4),
        "speedup": round(xla_ms / pl_ms, 2),
    }))


def bench_bn_stats():
    from mdhs_tpu.ops.bn_stats import bn_stats, bn_stats_reference

    for shape in [(128, 112, 112, 64), (128, 28, 28, 512)]:
        x = (jax.random.normal(jax.random.PRNGKey(0), shape) * 2 + 3).astype(
            jnp.bfloat16
        )
        fn = lambda x: jnp.concatenate(bn_stats(x))
        ref = lambda x: jnp.concatenate(bn_stats_reference(x))
        pl_ms = timed_chain(fn, x)
        xla_ms = timed_chain(ref, x)
        print(json.dumps({
            "kernel": f"bn_stats {'x'.join(map(str, shape))}",
            "pallas_ms": round(pl_ms, 4), "xla_ms": round(xla_ms, 4),
            "speedup": round(xla_ms / pl_ms, 2),
        }))


def bench_int8_ffn():
    """Fused a8w8 FFN sublayer vs (a) the XLA int8 composite and (b) the
    bf16 fused FFN kernel it competes with on the serving path."""
    from mdhs_tpu.ops import ffn_block
    from mdhs_tpu.ops.quant_kernel import int8_ffn_block, int8_ffn_block_reference

    N, H, Di = 512 * 128, 768, 3072  # bert-base serving shapes, B=512 L=128
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    x = (jax.random.normal(ks[0], (N, H)) * 0.5).astype(jnp.bfloat16)
    w1 = jax.random.normal(ks[1], (H, Di)) * 0.03
    b1 = jax.random.normal(ks[2], (Di,)) * 0.1
    w2 = jax.random.normal(ks[3], (Di, H)) * 0.03
    b2 = jax.random.normal(ks[4], (H,)) * 0.1
    g = jax.random.normal(ks[5], (H,)) * 0.2 + 1.0
    be = jax.random.normal(ks[6], (H,)) * 0.1

    pl_ms = timed_chain(
        lambda x: int8_ffn_block(x, w1, b1, w2, b2, g, be, 1e-12, "erf"), x)
    xla_ms = timed_chain(
        lambda x: int8_ffn_block_reference(x, w1, b1, w2, b2, g, be, 1e-12, "erf"), x)
    bf16_ms = timed_chain(
        lambda x: ffn_block.ffn_block(
            x, w1.astype(jnp.bfloat16), b1, w2.astype(jnp.bfloat16), b2,
            g, be, 1e-12, "erf"), x)
    print(json.dumps({
        "kernel": f"int8_ffn_block N{N} H{H} Di{Di}",
        "pallas_ms": round(pl_ms, 4), "xla_ms": round(xla_ms, 4),
        "speedup": round(xla_ms / pl_ms, 2),
        "bf16_fused_ms": round(bf16_ms, 4),
        "vs_bf16_fused": round(bf16_ms / pl_ms, 2),
    }))


if __name__ == "__main__":
    bench_selective_scan()
    bench_kan_forward()
    bench_bn_stats()
    bench_int8_ffn()
