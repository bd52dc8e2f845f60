#!/usr/bin/env python
"""Isolated optimizer-update microbench on the MIBF-sized param tree.

The train-step profile (docs/TRAIN_PERF.md) attributes ~11.7 ms of the
145.7 ms batch-128 step to the Adam update of the ~135M-param tree —
~2.5x the ~4.6 ms HBM roofline (7 passes over 540 MB f32 at ~820 GB/s).
This bench isolates the update to attribute that gap: per-leaf optax.adam
(what the trainer runs today, one XLA fusion per leaf) vs
optax.flatten(adam) (single flat vector: fewer fusions, but the
flatten/unflatten concats add two extra passes over the gradients).

K-step lax.scan with loop-variant grads (LICM-proof), hard host fetch.
"""
import time

import jax
import jax.numpy as jnp
import optax

K = 16
N_TIMED = 3


def main():
    from mdhs_tpu.models.bert import BertConfig
    from mdhs_tpu.models.mibf import MIBFNet

    model = MIBFNet(num_labels=7, bert=BertConfig(), dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((2, 224, 224, 3), jnp.bfloat16)
    ids = jnp.zeros((2, 128), jnp.int32)
    mask = jnp.ones((2, 128), jnp.int32)
    variables = jax.jit(lambda r: model.init({"params": r}, img, ids, mask))(rng)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.float32), variables["params"]
    )
    leaves = jax.tree_util.tree_leaves(params)
    print(f"params: {sum(x.size for x in leaves)/1e6:.1f}M in {len(leaves)} leaves")
    grads = jax.tree_util.tree_map(lambda p: jnp.full_like(p, 1e-4), params)

    def bench(tx, label):
        state = jax.jit(tx.init)(params)

        @jax.jit
        def chain(params, state, grads):
            def body(c, t):
                p, s = c
                g = jax.tree_util.tree_map(
                    lambda x: x + jnp.asarray(t, x.dtype) * 0, grads
                )
                up, s = tx.update(g, s, p)
                return (optax.apply_updates(p, up), s), None

            (p, s), _ = jax.lax.scan(body, (params, state), jnp.arange(K))
            return p, s

        p, s = chain(params, state, grads)
        jax.block_until_ready(p)
        t0 = time.perf_counter()
        for _ in range(N_TIMED):
            p, s = chain(params, state, grads)
            jax.block_until_ready(p)
        dt = (time.perf_counter() - t0) / (N_TIMED * K) * 1000
        print(f"{label}: {dt:.2f} ms/update")
        return dt

    bench(optax.adam(1e-4), "per-leaf adam")
    bench(optax.flatten(optax.adam(1e-4)), "flattened adam")


if __name__ == "__main__":
    main()
