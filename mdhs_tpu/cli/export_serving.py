"""AOT serving export: freeze the eval forward into a serialized artifact.

TPU-native deployment path beyond the reference's `.pth`-and-Python serving:
the jitted eval step (device-side preprocessing + model forward, weights
baked in as constants) is lowered once with `jax.export` and written as a
self-contained StableHLO artifact. A serving process deserializes and calls
it with zero Python model code — `load_and_run` below is the whole loader.

Reference behavior being packaged: scripts/predict.py:44-81 (uint8 batch ->
logits), with the same static batch/seq shapes XLA compiles for.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np
from jax import export as jax_export

from .common import build_trainer


def export_trainer_forward(trainer, batch_size: int, tta: bool = False,
                           tta_transforms=None):
    """Lower the trainer's eval step (weights closed over) to an Exported."""
    import jax.numpy as jnp

    step = trainer.eval_step_fn(tta=tta, tta_transforms=tta_transforms)
    state = trainer.state
    canvas = int(trainer.cfg.get("data.canvas", 256))
    seq_len = int(trainer.cfg.get("tokenizer.max_length", 128))

    spec = {
        "image": jax.ShapeDtypeStruct((batch_size, canvas, canvas, 3), jnp.uint8),
        "input_ids": jax.ShapeDtypeStruct((batch_size, seq_len), jnp.int32),
        "attention_mask": jax.ShapeDtypeStruct((batch_size, seq_len), jnp.int32),
    }
    if getattr(trainer, "_tabular_dim", 0):
        spec["tabular"] = jax.ShapeDtypeStruct(
            (batch_size, trainer._tabular_dim), jnp.float32
        )

    def serve(batch):
        return step(state, batch)

    return jax_export.export(jax.jit(serve))(spec), spec


def load_and_run(path: str, batch: dict):
    """The entire serving-side loader: deserialize + call."""
    with open(path, "rb") as f:
        exported = jax_export.deserialize(bytearray(f.read()))
    return exported.call(batch)


def main(argv=None):
    p = argparse.ArgumentParser(description="Export a compiled serving artifact")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--family", type=str, default="baseline",
                   choices=["baseline", "mibf", "connext"])
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--tta", action="store_true",
                   help="bake fused TTA (hflip/vflip/rot90) into the artifact")
    p.add_argument("--smoke_test", action="store_true",
                   help="deserialize the written artifact and run one batch")
    p.add_argument("--set", dest="overrides", action="append", default=[])
    args = p.parse_args(argv)

    trainer = build_trainer(
        args.config, family=args.family, overrides=args.overrides, setup_data=False
    )
    if args.model_path:
        trainer.load_weights(args.model_path)
    exported, spec = export_trainer_forward(
        trainer, args.batch_size,
        tta=args.tta, tta_transforms=("hflip", "vflip", "rot90") if args.tta else None,
    )
    blob = exported.serialize()
    out_dir = os.path.dirname(args.output)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    with open(args.output, "wb") as f:
        f.write(blob)

    info = {
        "output": args.output,
        "bytes": len(blob),
        "platforms": list(exported.platforms),
        "batch_size": args.batch_size,
        "inputs": {k: [list(v.shape), str(v.dtype)] for k, v in spec.items()},
    }
    if args.smoke_test:
        rng = np.random.default_rng(0)
        batch = {
            k: np.asarray(
                rng.integers(0, 2, v.shape) if "int" in str(v.dtype)
                else rng.random(v.shape), dtype=v.dtype
            )
            for k, v in spec.items()
        }
        logits = np.asarray(load_and_run(args.output, batch))
        info["smoke_logits_shape"] = list(logits.shape)
        info["smoke_finite"] = bool(np.isfinite(logits).all())
    print(json.dumps(info))
    return info


if __name__ == "__main__":
    main()
