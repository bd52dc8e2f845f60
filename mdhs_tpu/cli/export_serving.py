"""AOT serving export: freeze the eval forward into a serialized artifact.

TPU-native deployment path beyond the reference's `.pth`-and-Python serving:
the jitted eval step (device-side preprocessing + model forward) is lowered
once with `jax.export` and written, together with the weights, as a single
self-contained artifact. A serving process deserializes and calls it with
zero Python model code — `load_and_run` below is the whole loader.

Artifact format (v2): one ZIP container holding
  meta.json    — format tag, weight-leaf table (shape/dtype), input spec
  fn.bin       — the serialized jax.export Exported (StableHLO)
  leaf_NNNNN   — raw bytes of each weight leaf, in pytree-flatten order
Weights ride as RUNTIME ARGUMENTS of the exported function, not baked-in
constants: constant-baking a production tower (BERT-base + ResNet50,
~135M params) bloats the StableHLO by ~0.5 GB, blows compile-time memory,
and was measured to exceed request limits on relay-fronted compile services.
v1 artifacts (raw Exported blob with weights as constants) still load.

Reference behavior being packaged: scripts/predict.py:44-81 (uint8 batch ->
logits), with the same static batch/seq shapes XLA compiles for.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import zipfile

import jax
import numpy as np
from jax import export as jax_export

from .common import build_trainer

_FORMAT = "mdhs-serving-v2"


def export_trainer_forward(trainer, batch_size: int, tta: bool = False,
                           tta_transforms=None):
    """Lower the trainer's eval step to an Exported taking (weights, batch).

    Returns (exported, spec, weight_leaves) — the leaves are what the
    artifact stores and what `exported.call` expects as its first argument.
    """
    import jax.numpy as jnp

    step = trainer.eval_step_fn(tta=tta, tta_transforms=tta_transforms)
    # opt_state is training-only; dropping it (None = empty subtree) keeps
    # Adam moments out of the artifact.
    eval_state = trainer.state.replace(opt_state=None)
    leaves, treedef = jax.tree_util.tree_flatten(eval_state)
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

    def serve(weight_leaves, batch):
        return step(jax.tree_util.tree_unflatten(treedef, weight_leaves), batch)

    leaf_spec = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves]
    exported = jax_export.export(jax.jit(serve))(leaf_spec, spec)
    return exported, spec, leaves


def write_artifact(path: str, exported, spec, leaves) -> dict:
    """Write the v2 ZIP container; returns size info for the CLI report."""
    leaf_meta = []
    weight_bytes = 0
    fn_blob = exported.serialize()
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED) as z:
        for i, leaf in enumerate(leaves):
            arr = np.asarray(leaf)
            leaf_meta.append({"shape": list(arr.shape), "dtype": arr.dtype.name})
            data = arr.tobytes()
            weight_bytes += len(data)
            z.writestr(f"leaf_{i:05d}", data)
        z.writestr("fn.bin", fn_blob)
        z.writestr("meta.json", json.dumps({
            "format": _FORMAT,
            "leaves": leaf_meta,
            "inputs": {k: [list(v.shape), str(v.dtype)] for k, v in spec.items()},
        }))
    return {"fn_bytes": len(fn_blob), "weight_bytes": weight_bytes}


def load_and_run(path: str, batch: dict):
    """The entire serving-side loader: deserialize + call."""
    import jax.numpy as jnp

    if zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as z:
            meta = json.loads(z.read("meta.json"))
            if meta["format"] != _FORMAT:
                raise ValueError(
                    f"unsupported serving artifact format {meta['format']!r} "
                    f"(expected {_FORMAT!r})"
                )
            exported = jax_export.deserialize(bytearray(z.read("fn.bin")))
            leaves = [
                np.frombuffer(z.read(f"leaf_{i:05d}"),
                              dtype=jnp.dtype(m["dtype"])).reshape(m["shape"])
                for i, m in enumerate(meta["leaves"])
            ]
        return exported.call(leaves, batch)
    # v1: raw Exported blob, weights baked in as constants
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
    exported, spec, leaves = export_trainer_forward(
        trainer, args.batch_size,
        tta=args.tta, tta_transforms=("hflip", "vflip", "rot90") if args.tta else None,
    )
    out_dir = os.path.dirname(args.output)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    sizes = write_artifact(args.output, exported, spec, leaves)

    info = {
        "output": args.output,
        "format": _FORMAT,
        "bytes": os.path.getsize(args.output),
        **sizes,
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
