"""Evaluation CLI: accuracy + full metric report on a labeled test split
(reference run_evaluate.py / scripts/evaluate.py; metric report parity with
ConNexT/models/test.py sklearn outputs)."""

from __future__ import annotations

import argparse
import json

import jax.numpy as jnp
import numpy as np

from ..train.metrics import classification_report
from .common import build_trainer, run_prediction


def main(argv=None):
    p = argparse.ArgumentParser(description="Evaluate on a labeled test set")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--image_dir", type=str, default=None)
    p.add_argument("--json_path", type=str, default=None)
    p.add_argument("--label_csv", type=str, default=None)
    p.add_argument("--family", type=str, default="baseline",
                   choices=["baseline", "mibf", "connext"])
    p.add_argument("--report_json", type=str, default=None)
    p.add_argument("--set", dest="overrides", action="append", default=[])
    args = p.parse_args(argv)

    trainer = build_trainer(
        args.config, family=args.family, overrides=args.overrides, setup_data=False
    )
    trainer.load_weights(args.model_path)
    loader = trainer.make_test_loader(args.image_dir, args.json_path, args.label_csv)
    ids, preds, logits = run_prediction(trainer, loader)
    labels = np.asarray([m["label"] for m in loader.dataset.metadata], np.int32)

    num_classes = trainer.cfg.get("model.num_classes", 7)
    report = classification_report(jnp.asarray(logits), jnp.asarray(labels), num_classes)
    out = {
        "accuracy": float(report["accuracy"]) * 100.0,
        "accuracy_macro": float(report["accuracy_macro"]),
        "precision_macro": float(report["precision_macro"]),
        "recall_macro": float(report["recall_macro"]),
        "f1_macro": float(report["f1_macro"]),
        "auroc_macro": float(report["auroc_macro"]),
        "per_class_f1": np.asarray(report["per_class"]["f1"]).tolist(),
        "confusion_matrix": np.asarray(report["confusion_matrix"]).astype(int).tolist(),
        "num_samples": len(ids),
    }
    print(json.dumps(out, indent=2))
    if args.report_json:
        with open(args.report_json, "w") as f:
            json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main()
