"""Analysis CLI: Grad-CAM overlays + feature-rank SVD
(reference run_analysis_cli.py / scripts/run_analysis.py:28-241)."""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..analysis.feature_rank import FeatureRankAnalyzer
from ..analysis.gradcam import gradcam_device, visualize_cam
from .common import build_trainer


def zero_perturbations(model, images, input_ids, attention_mask, tabular=None):
    """Zero 'perturbations' collection with batch-correct shapes (no compute)."""
    shapes = jax.eval_shape(
        lambda r: model.init(
            {"params": r},
            images,
            input_ids,
            attention_mask,
            tabular_input=tabular,
            method=model.logits_and_taps,
        ),
        jax.random.PRNGKey(0),
    )
    perts = shapes.get("perturbations", {})
    return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, jnp.float32), perts)


def main(argv=None):
    p = argparse.ArgumentParser(description="Grad-CAM + feature rank analysis")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--image_dir", type=str, default=None)
    p.add_argument("--json_path", type=str, default=None)
    p.add_argument("--output_dir", type=str, default="analysis_out")
    p.add_argument("--num_cam_images", type=int, default=20)
    p.add_argument("--set", dest="overrides", action="append", default=[])
    args = p.parse_args(argv)

    trainer = build_trainer(
        args.config, family="baseline", overrides=args.overrides, setup_data=False
    )
    trainer.load_weights(args.model_path)
    loader = trainer.make_test_loader(args.image_dir, args.json_path)
    os.makedirs(args.output_dir, exist_ok=True)

    model = trainer.model
    rank = FeatureRankAnalyzer()
    n_cam_done = 0
    variables = trainer.variables()
    feature_fn = jax.jit(
        lambda v, im, ii, am, tab: model.apply(
            v, im, ii, am, tabular_input=tab, method=model.forward_features
        )
    )

    # ONE jitted forward+backward for Grad-CAM, hoisted out of the loop:
    # batch tensors are arguments (not closure captures), so every batch
    # after the first hits the jit cache. The zero perturbations collection
    # is built once — loader batches have static padded shapes.
    def _cam_step(v, p, im, ii, am, tab):
        def fwd(vv):
            return model.apply(
                vv, im, ii, am, tabular_input=tab, method=model.logits_and_taps
            )

        return gradcam_device(
            fwd, {**v, "perturbations": p}, image_size=trainer.image_size
        )

    cam_step = jax.jit(_cam_step)
    perts = None

    for batch in loader:
        jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "image_id"}
        images = trainer._preprocess_eval(jb["image"])
        n = int(batch["n_valid"])

        feats = feature_fn(variables, images, jb["input_ids"], jb["attention_mask"],
                           jb.get("tabular"))
        rank.add(np.asarray(feats, np.float32)[:n])

        if n_cam_done < args.num_cam_images:
            if perts is None:
                perts = zero_perturbations(
                    model, images, jb["input_ids"], jb["attention_mask"], jb.get("tabular")
                )
            cams, _ = cam_step(
                variables, perts, images, jb["input_ids"], jb["attention_mask"],
                jb.get("tabular"),
            )
            cams = np.asarray(cams, np.float32)
            raw = np.asarray(jb["image"], np.uint8)
            S = trainer.image_size
            take = min(n, args.num_cam_images - n_cam_done)
            for i in range(take):
                img01 = raw[i].astype(np.float32) / 255.0
                y0 = (img01.shape[0] - S) // 2
                x0 = (img01.shape[1] - S) // 2
                img01 = img01[y0 : y0 + S, x0 : x0 + S]
                overlay = visualize_cam(img01, cams[i])
                out = os.path.join(args.output_dir, f"cam_{batch['image_id'][i]}.jpg")
                Image.fromarray(overlay).save(out)
            n_cam_done += take

    result = rank.compute()
    rank.plot(os.path.join(args.output_dir, "feature_rank.png"))
    print(
        f"effective rank: {result['effective_rank']:.1f}; "
        f"rank@1%: {result['rank_at_1pct']}; CAMs written: {n_cam_done}"
    )
    return result


if __name__ == "__main__":
    main()
