#!/usr/bin/env python
"""Isolated optimizer-update microbench on the MIBF-sized param tree.

The train-step profile (docs/TRAIN_PERF.md) attributes ~11.7 ms of the
145.7 ms batch-128 step to the Adam update of the ~135M-param tree. This
bench isolates the update: per-leaf optax.adam (what the trainer runs,
one XLA fusion per leaf) vs optax.flatten(adam) (single flat vector) vs
bucketed_flatten (small leaves only).

MEASUREMENT TRAP (round 4): if the per-iteration grads are elementwise
functions of loop-invariant data, the whole K-step Adam chain is itself
elementwise per parameter, so XLA unrolls the scan and VERTICALLY FUSES
all K updates into ONE HBM pass (measured 0.57 ms/update — ~7 TB/s
apparent bandwidth on a chip whose triad streaming ceiling is ~400 GB/s,
i.e. fake). The real train step interposes fwd+bwd between updates, so
no such fusion exists there. To make this bench honest, each iteration's
grads are scaled by a GLOBAL REDUCTION over the previous params — the
reduction is a barrier that kills cross-iteration elementwise chaining.

K-step lax.scan, hard host fetch.
"""
import time

import jax
import jax.numpy as jnp
import optax

K = 32
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
                # Reduction over EVERY evolving leaf = a barrier per
                # iteration (see module docstring): each leaf's next grads
                # depend on its own reduced current params, so no leaf's
                # update chain can be vertically fused across iterations.
                # Costs one extra read pass over the params (~1.6 ms at the
                # ~400 GB/s triad ceiling) — identical for all variants, so
                # A/B deltas are unaffected.
                scale = 1.0 + 1e-9 * sum(
                    x.mean() for x in jax.tree_util.tree_leaves(p)
                )
                g = jax.tree_util.tree_map(lambda x: x * scale, grads)
                up, s = tx.update(g, s, p)
                return (optax.apply_updates(p, up), s), None

            (p, s), _ = jax.lax.scan(body, (params, state), jnp.arange(K))
            return p, s

        import numpy as np

        def run_once():
            p, s = chain(params, state, grads)
            # HARD host fetch: jax.block_until_ready is NOT a hard sync
            # through the axon relay (measured: 16 updates "completed" in
            # under one RPC roundtrip) — fetch real bytes instead.
            np.asarray(jax.tree_util.tree_leaves(p)[0])

        run_once()
        t0 = time.perf_counter()
        for _ in range(N_TIMED):
            run_once()
        dt = (time.perf_counter() - t0) / (N_TIMED * K) * 1000
        print(f"{label}: {dt:.2f} ms/update (incl ~1-2 ms barrier+dispatch)")
        return dt

    from mdhs_tpu.train.optim import BUCKET_THRESHOLD_ELEMS, bucketed_flatten

    n_small = sum(1 for x in leaves if x.size < BUCKET_THRESHOLD_ELEMS)
    small_mb = sum(x.size for x in leaves if x.size < BUCKET_THRESHOLD_ELEMS) * 4 / 1e6
    print(f"bucketed: {n_small} small leaves ({small_mb:.1f} MB f32) -> 1 vector")
    bench(optax.adam(1e-4), "per-leaf adam")
    bench(optax.flatten(optax.adam(1e-4)), "flattened adam")
    bench(bucketed_flatten(lambda: optax.adam(1e-4)), "bucketed adam")


if __name__ == "__main__":
    main()
