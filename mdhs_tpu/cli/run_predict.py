"""Prediction CLI -> submission CSV (reference run_predict.py / scripts/predict.py)."""

from __future__ import annotations

import argparse

from .common import build_trainer, run_prediction, write_submission


def main(argv=None, family: str = "baseline"):
    p = argparse.ArgumentParser(description="Predict labels for a test set")
    p.add_argument("--image_dir", type=str, default=None)
    p.add_argument("--json_path", type=str, default=None)
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--output_path", type=str, required=True)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--family", type=str, default=family,
                   choices=["baseline", "mibf", "connext"])
    p.add_argument("--save_probs", type=str, default=None,
                   help="optionally write per-class softmax probabilities CSV "
                        "(parity with mibf_net/predict_resnet_ham_image.py)")
    p.add_argument("--compute_auc", action="store_true",
                   help="print macro one-vs-rest AUC when the test split has "
                        "labels (mibf_net/predict_resnet_ham_image.py:69,101-116)")
    p.add_argument("--set", dest="overrides", action="append", default=[])
    args = p.parse_args(argv)

    trainer = build_trainer(
        args.config, family=args.family, overrides=args.overrides, setup_data=False
    )
    trainer.load_weights(args.model_path)
    loader = trainer.make_test_loader(args.image_dir, args.json_path)
    tta_cfg = trainer.cfg.get("inference.tta", {})
    ids, preds, logits = run_prediction(trainer, loader, tta_cfg=tta_cfg)
    write_submission(args.output_path, ids, preds)
    if args.save_probs or args.compute_auc:
        import numpy as np

        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs = probs / probs.sum(-1, keepdims=True)
    if args.save_probs:
        import csv

        with open(args.save_probs, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["image_id"] + [f"prob_{i}" for i in range(probs.shape[1])])
            for i, row in zip(ids, probs):
                w.writerow([i] + [f"{p_:.6f}" for p_ in row])
    if args.compute_auc:
        labels = list(getattr(loader.dataset, "labels", []) or [])
        if labels and min(labels) >= 0:
            import jax.numpy as jnp

            from ..train.metrics import auroc_ovr_macro

            auc = float(auroc_ovr_macro(
                jnp.asarray(probs), jnp.asarray(np.asarray(labels[: len(probs)])),
                probs.shape[1],
            ))
            print(f"Macro AUC: {auc:.4f}")
        else:
            print("AUC computation skipped: no labels in the test split")
    print(f"wrote {len(ids)} predictions to {args.output_path}")


if __name__ == "__main__":
    main()
