#!/usr/bin/env python
"""Training-step throughput through the REAL Trainer (not a hand-rolled step).

Builds a MIBF-family Trainer (ResNet50 + BERT-base, MP-Loss, Adam) on a
synthetic on-disk dataset at real shapes (canvas 256 -> 224 crop, seq 128),
then times K train steps chained inside ONE jitted lax.scan (same
methodology as bench.py): the state threads through the scan so XLA cannot
elide any step, and a single hard host fetch closes the chain. Per-call
dispatch through the relay is pathological for step-shaped payloads
(donation + per-dispatch overhead measured 1.4-54s/step for a ~210ms
device-time step), so per-call timing is NOT used.

Diagnostic benchmark; bench.py (eval path) is the scored entry point.
"""

import json
import os
import tempfile
import time

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax
import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "128"))
K = 10


def measure(batch: int = BATCH, k: int = K, training_overrides: dict = None):
    """Returns {"train_ips", "train_step_ms", "final_loss"} for the real
    Trainer step at the given batch. Shared with bench.py (scored JSON).

    training_overrides: extra training.* config keys (A/B knobs, e.g.
    {"flatten_optimizer": True}); also settable via env
    BENCH_TRAIN_OVERRIDES='{"flatten_optimizer": true}'."""
    from mdhs_tpu.core.config import Config
    from mdhs_tpu.data.synthetic import generate_synthetic_dataset, synthetic_config

    with tempfile.TemporaryDirectory() as tmp:
        paths = generate_synthetic_dataset(
            tmp, num_images=batch, num_classes=7, image_size=256
        )
        cd = synthetic_config(paths, tmp, batch_size=batch, num_epochs=1,
                              max_length=128)
        cd["data"]["canvas"] = 256
        cd["data"]["image_size"] = 224
        cd["model"]["text_encoder"]["preset"] = "base"
        cd["training"]["precision"] = "bf16"
        cd["training"]["learning_rate"] = 1e-4
        env_over = os.environ.get("BENCH_TRAIN_OVERRIDES")
        cfg = Config(cd)
        for src in (json.loads(env_over) if env_over else None, training_overrides):
            for key, val in (src or {}).items():
                # dotted keys address the whole config ("model.fast_math");
                # bare keys stay training.* A/B knobs for compatibility
                cfg.set(key if "." in key else f"training.{key}", val)

        from mdhs_tpu.train.trainer import Trainer

        trainer = Trainer(cfg, family="mibf",
                          output_dir=os.path.join(tmp, "run"))
        step = trainer.train_step_fn()
        jbatch = trainer._device_batch(next(iter(trainer.train_loader)))
        rng = trainer.rng

        @jax.jit
        def chain(state, batch):
            def body(state, _):
                new_state, metrics = step(state, batch, rng)
                return new_state, metrics["loss"]

            return jax.lax.scan(body, state, None, length=k)

        state, losses = chain(trainer.state, jbatch)  # compile + warmup
        np.asarray(losses)
        t0 = time.perf_counter()
        state, losses = chain(state, jbatch)
        loss = float(np.asarray(losses)[-1])  # hard fetch closes the chain
        elapsed = time.perf_counter() - t0

        return {
            "train_ips": round(k * batch / elapsed, 1),
            "train_step_ms": round(elapsed / k * 1e3, 2),
            "final_loss": round(loss, 4),
            "batch": batch,
        }


def main():
    r = measure()
    print(json.dumps({
        "metric": "train images/sec/chip (MIBF ResNet50+BERT, fused aug+fwd+bwd+update)",
        "value": r["train_ips"],
        "unit": "images/sec/chip",
        "step_ms": r["train_step_ms"],
        "final_loss": r["final_loss"],
        "batch": r["batch"],
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
