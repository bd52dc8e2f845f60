"""Artifact serving CLI: exported AOT artifact -> submission CSV.

The deployment end of the export_serving path: no model code, no weights
loading, no family logic — the config is consulted ONLY for data paths and
tokenizer settings; everything about the model (graph, weights, shapes,
quantization preset) is frozen inside the artifact. The request loop is the
pipelined ServingModel.predict_stream, so host->device transfer of batch
k+1 overlaps batch k's compute.

This surface exceeds the reference, whose serving is a live torch model in
a Python loop (/root/reference/scripts/predict.py:44-81); output CSV format
matches it exactly (image_id,predicted_label — scripts/predict.py:168-178).
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Serve predictions from an exported AOT artifact"
    )
    p.add_argument("--artifact", type=str, required=True,
                   help="path written by run_export_serving.py")
    p.add_argument("--config", type=str, required=True,
                   help="config for data paths + tokenizer (model section unused)")
    p.add_argument("--image_dir", type=str, default=None)
    p.add_argument("--json_path", type=str, default=None)
    p.add_argument("--output_path", type=str, required=True)
    p.add_argument("--depth", type=int, default=2,
                   help="max in-flight requests in the pipelined loop")
    p.add_argument("--family", type=str, default="baseline",
                   choices=["baseline", "mibf", "connext"],
                   help="data-convention family (mibf strips CJK text, "
                        "matching the trainer's loaders)")
    p.add_argument("--set", dest="overrides", action="append", default=[])
    args = p.parse_args(argv)

    from ..core.config import load_config
    from ..data.datasets import DatasetOptions, MultimodalDataset
    from ..data.loader import DataLoader
    from ..data.tokenizer import load_tokenizer
    from ..serving import ServingModel
    from .common import write_submission

    cfg = load_config(args.config).with_overrides(args.overrides)

    model = ServingModel.load(args.artifact)

    tokenizer = load_tokenizer(
        cfg.get("model.text_encoder.model_name"),
        vocab_size=cfg.get("model.text_encoder.vocab_size", 30522),
    )
    d = cfg.get("data")
    opts = DatasetOptions(
        # the artifact's static shapes are the source of truth
        max_length=int(model.input_spec["input_ids"][0][1])
        if "input_ids" in model.input_spec
        else int(cfg.get("tokenizer.max_length", 128)),
        tabular_enabled="tabular" in model.input_spec,
        tabular_fields=tuple(cfg.get(
            "model.tabular.fields", ["age", "sex", "localization"]) or []),
        tabular_normalize=cfg.get("model.tabular.normalize", "zscore"),
        metadata_csv=d.get("metadata_csv"),
        extra_image_dirs=tuple(d.get("extra_image_dirs", []) or []),
        clean_cjk_text=args.family == "mibf",
        canvas=int(model.input_spec["image"][0][1]),
        cache=bool(d.get("cache", True)),
    )
    ds = MultimodalDataset(
        args.image_dir or d.get("test_image_dir"),
        args.json_path or d.get("test_json_path"),
        d.get("test_label_csv"),
        tokenizer, opts,
    )
    loader = DataLoader(ds, batch_size=model.batch_size)

    ids, preds = [], []

    def requests():
        for batch in loader:
            n = int(batch["n_valid"])
            ids.extend(batch["image_id"][:n])
            yield {k: np.asarray(batch[k])[:n] for k in model.input_spec}

    for logits in model.predict_stream(requests(), depth=args.depth):
        preds.extend(logits.argmax(-1).tolist())

    write_submission(args.output_path, ids, preds)
    print(f"served {len(ids)} predictions from {args.artifact} "
          f"-> {args.output_path}")
    return ids, preds


if __name__ == "__main__":
    main()
