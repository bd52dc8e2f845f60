#!/usr/bin/env python
"""int8 serving preset through the exported AOT artifact, on-chip (VERDICT r4 #7).

The r4 drift numbers for the int8 a8w8 BERT tower were measured through the
LIVE jit path (benchmarks/fast_math_drift.py). Serving deploys through the
AOT artifact (cli/export_serving.py) instead — a different compile path
(jax.export StableHLO round-trip, incl. the Mosaic custom calls of the
fused int8 Pallas kernels). This script proves the preset end-to-end:

  1. export the serving-preset (fast_math + int8) MIBF forward at a real
     batch/seq shape into the v2 artifact;
  2. load_and_run it on-chip; compare against
     (a) the live jit int8 path (AOT-vs-live drift: should be ~0) and
     (b) the exact-parity path with the SAME weights (the known int8
         preset drift, re-measured through the artifact);
  3. time repeated artifact calls (per-call, dispatch included — the honest
     serving view).

Weights are random-init (same seed across both trainers; no reference
checkpoint ships in this environment) — drift magnitudes at random weights
matched the converted-weights magnitudes in the r4 live-path measurements.

Prints ONE JSON line. Reference serving path being exceeded:
scripts/predict.py:44-81 (.pth + Python per-batch loop).
"""

import json
import os
import sys
import tempfile
import time

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "256"))
N_TIMED = 5


def main():
    import jax
    import jax.numpy as jnp

    from mdhs_tpu.cli.common import build_trainer
    from mdhs_tpu.cli.export_serving import (
        export_trainer_forward, load_and_run, write_artifact,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = os.path.join(repo, "configs", "serving", "mibf_ham_serving.yml")

    tr_int8 = build_trainer(cfg, family="mibf", setup_data=False)
    tr_parity = build_trainer(
        cfg, family="mibf", setup_data=False,
        overrides=["model.fast_math=false", "model.text_encoder.quantize=none"],
    )
    # same training.seed -> identical init; make it airtight by sharing state
    tr_parity.state = tr_parity.state.replace(
        params=tr_int8.state.params, batch_stats=tr_int8.state.batch_stats
    )

    canvas = int(tr_int8.cfg.get("data.canvas", 256))
    seq = int(tr_int8.cfg.get("tokenizer.max_length", 128))
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.integers(0, 255, (BATCH, canvas, canvas, 3)).astype(np.uint8),
        "input_ids": rng.integers(0, 30000, (BATCH, seq)).astype(np.int32),
        "attention_mask": np.ones((BATCH, seq), np.int32),
    }
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    live_int8 = np.asarray(tr_int8.eval_step_fn()(tr_int8.state, jb), np.float32)
    live_parity = np.asarray(tr_parity.eval_step_fn()(tr_parity.state, jb), np.float32)

    exported, spec, leaves = export_trainer_forward(tr_int8, batch_size=BATCH)
    with tempfile.TemporaryDirectory() as tmp:
        art = os.path.join(tmp, "mibf_ham_serving_int8.jaxexport")
        info = write_artifact(art, exported, spec, leaves)
        t0 = time.perf_counter()
        aot = np.asarray(load_and_run(art, batch), np.float32)
        cold_load_s = time.perf_counter() - t0

        # Steady-state serving: deserialize ONCE, keep weights device-
        # resident, jit the exported call so XLA reuses one executable —
        # what a real serving process does after startup.
        import zipfile

        from jax import export as jax_export

        with zipfile.ZipFile(art) as z:
            meta = json.loads(z.read("meta.json"))
            exp2 = jax_export.deserialize(bytearray(z.read("fn.bin")))
            w = [
                np.frombuffer(z.read(f"leaf_{i:05d}"),
                              dtype=np.dtype(m["dtype"])).reshape(m["shape"])
                for i, m in enumerate(meta["leaves"])
            ]
        w = [jnp.asarray(x) for x in w]
        serve = jax.jit(lambda w, b: exp2.call(w, b))
        np.asarray(serve(w, jb))  # compile + warmup
        t_ips = []
        for _ in range(N_TIMED):
            t0 = time.perf_counter()
            np.asarray(serve(w, jb))
            t_ips.append(BATCH / (time.perf_counter() - t0))

        # ServingModel runtime (mdhs_tpu/serving.py): same executable, but
        # the request loop is pipelined — batch k+1's host->device transfer
        # and dispatch RPC overlap batch k's compute. Distinct host batches
        # per call (a real request stream; no array reuse to hide H2D).
        from mdhs_tpu.serving import ServingModel

        model = ServingModel.load(art)
        n_req = 2 * N_TIMED
        reqs = []
        for i in range(n_req):
            r = np.random.default_rng(100 + i)
            reqs.append({
                "image": r.integers(0, 255, (BATCH, canvas, canvas, 3)
                                    ).astype(np.uint8),
                "input_ids": r.integers(0, 30000, (BATCH, seq)).astype(np.int32),
                "attention_mask": np.ones((BATCH, seq), np.int32),
            })
        model.predict(reqs[0])  # warmup (compile of the padded-call wrapper)
        t0 = time.perf_counter()
        for r in reqs:
            model.predict(r)
        sync_ips = n_req * BATCH / (time.perf_counter() - t0)
        t0 = time.perf_counter()
        outs = list(model.predict_stream(iter(reqs), depth=3))
        pipe_ips = n_req * BATCH / (time.perf_counter() - t0)
        assert len(outs) == n_req
        np.testing.assert_allclose(outs[0], model.predict(reqs[0]), atol=0)

    scale = float(np.abs(live_parity).max())
    result = {
        "metric": "int8 serving artifact drift + throughput (AOT path)",
        "batch": BATCH,
        "artifact_mb": round((info["fn_bytes"] + info["weight_bytes"]) / 2**20, 1),
        "aot_vs_live_int8_max": float(np.abs(aot - live_int8).max()),
        "int8_vs_parity_max": float(np.abs(aot - live_parity).max()),
        "int8_vs_parity_rel": round(float(np.abs(aot - live_parity).max()) / scale, 5),
        "argmax_agreement_pct": round(
            100.0 * float((aot.argmax(-1) == live_parity.argmax(-1)).mean()), 2
        ),
        "cold_load_and_run_s": round(cold_load_s, 1),
        "aot_steady_ips_median": round(float(np.median(t_ips)), 1),
        "aot_steady_ips_min": round(float(min(t_ips)), 1),
        "aot_steady_ips_max": round(float(max(t_ips)), 1),
        "serving_sync_loop_ips": round(float(sync_ips), 1),
        "serving_pipelined_ips": round(float(pipe_ips), 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
