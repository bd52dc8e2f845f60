"""Ablation evaluation CLI: full_fusion / image_only / text_off accuracy
(+ optional TTA), persisted to YAML (reference run_ablation_eval.py /
scripts/ablation_eval.py:35-161)."""

from __future__ import annotations

import argparse
import os
from datetime import datetime

import numpy as np
import yaml

from .common import build_trainer, run_prediction

MODES = {"full_fusion": None, "image_only": "image_only", "text_off": "text_off"}


def main(argv=None):
    p = argparse.ArgumentParser(description="Ablation evaluation")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--image_dir", type=str, default=None)
    p.add_argument("--json_path", type=str, default=None)
    p.add_argument("--label_csv", type=str, default=None)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--set", dest="overrides", action="append", default=[])
    args = p.parse_args(argv)

    trainer = build_trainer(
        args.config, family="baseline", overrides=args.overrides, setup_data=False
    )
    trainer.load_weights(args.model_path)
    loader = trainer.make_test_loader(args.image_dir, args.json_path, args.label_csv)
    labels = np.asarray([m["label"] for m in loader.dataset.metadata], np.int32)
    tta_cfg = trainer.cfg.get("inference.tta", {})

    results = {}
    for name, mode in MODES.items():
        _, preds, _ = run_prediction(
            trainer, loader, tta_cfg=tta_cfg, ablation_mode=mode
        )
        acc = 100.0 * float((np.asarray(preds) == labels).mean())
        results[name] = round(acc, 4)
        print(f"{name}: {acc:.2f}%")

    out_path = args.output or os.path.join(
        trainer.output_dir, f"ablation_{datetime.now().strftime('%Y%m%d_%H%M%S')}.yml"
    )
    with open(out_path, "w") as f:
        yaml.safe_dump(
            {"model_path": args.model_path, "results": results}, f, sort_keys=False
        )
    print(f"results written to {out_path}")
    return results


if __name__ == "__main__":
    main()
