#!/usr/bin/env python
"""Quantify the fast_math serving preset's logit drift vs exact-parity mode.

VERDICT r2 weak #8: the preset no longer buys measurable throughput
(BENCH_r02 4403 vs 4395 img/s) but carries accuracy risk. This measures
that risk so PARITY.md can document a number instead of a hand-wave:

- builds a random-weight bert-base-shaped tower twice (fast_math on/off),
  identical params, bf16 compute (the serving dtype), on the current
  backend (run under axon for the real-TPU number);
- reports max / mean |delta| of the CLS vector and of final hidden states,
  plus the same deltas for the f32 exact path as the noise floor.

Diagnostic only; not part of the test suite.
"""

import os

os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from mdhs_tpu.models.bert import BertConfig, BertModel

    B, L = 32, 128
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 30000, (B, L)), jnp.int32)
    mask = jnp.asarray((rng.random((B, L)) > 0.2).astype(np.int32))

    def mk(**kw):
        return BertConfig(hidden_dropout=0.0, attention_dropout=0.0, **kw)

    cfg_exact = mk()

    model32 = BertModel(cfg_exact, dtype=jnp.float32)
    params = jax.jit(model32.init)(jax.random.PRNGKey(0), ids[:2], mask[:2])

    def run(cfg, dtype):
        m = BertModel(cfg, dtype=dtype)
        hidden, pooled = jax.jit(
            lambda p, i, a: m.apply(p, i, a)
        )(params, ids, mask)
        return (np.asarray(hidden, np.float32),
                np.asarray(hidden[:, 0, :], np.float32))

    h_ref, cls_ref = run(cfg_exact, jnp.float32)
    scale = float(np.mean(np.abs(cls_ref)))
    for name, cfg, dtype in [
        ("bf16 exact auto (default serving)", cfg_exact, jnp.bfloat16),
        ("bf16 fast_math auto (fused kernels: tanh-GELU only)",
         mk(fast_math=True), jnp.bfloat16),
        ("bf16 exact xla", mk(attention_impl="xla"), jnp.bfloat16),
        ("bf16 fast_math xla (bf16 softmax + tanh-GELU)",
         mk(fast_math=True, attention_impl="xla"), jnp.bfloat16),
        ("bf16 int8 a8w8 (quantize='int8' serving preset)",
         mk(quantize="int8"), jnp.bfloat16),
    ]:
        h, cls = run(cfg, dtype)
        print(f"{name}: CLS max|d|={np.max(np.abs(cls - cls_ref)):.3e} "
              f"mean|d|={np.mean(np.abs(cls - cls_ref)):.3e} "
              f"(CLS scale {scale:.3f}); "
              f"hidden max|d|={np.max(np.abs(h - h_ref)):.3e}")


if __name__ == "__main__":
    main()
