"""CLI round-trip on synthetic data: train -> predict CSV -> evaluate ->
ablation YAML (the reference's full run_* surface, SURVEY.md §3)."""

import csv
import glob
import os

import pytest
import yaml

from mdhs_tpu.core.config import Config
from mdhs_tpu.data.synthetic import generate_synthetic_dataset, synthetic_config


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    paths = generate_synthetic_dataset(str(root), num_images=12, image_size=48)
    cfg = synthetic_config(paths, str(root), batch_size=4, num_epochs=1, max_length=16)
    cfg["data"]["canvas"] = 56
    cfg["data"]["image_size"] = 48
    cfg_path = os.path.join(str(root), "config.yml")
    Config(cfg).save(cfg_path)

    from mdhs_tpu.cli.run_train import main as train_main

    trainer = train_main(["--config", cfg_path])
    ckpts = glob.glob(os.path.join(trainer.output_dir, "epoch_*.msgpack"))
    assert ckpts, "no checkpoint written"
    return root, paths, cfg_path, ckpts[0]


def test_predict_cli(trained, tmp_path):
    from mdhs_tpu.cli.run_predict import main as predict_main

    root, paths, cfg_path, ckpt = trained
    out_csv = str(tmp_path / "submission.csv")
    predict_main([
        "--config", cfg_path, "--model_path", ckpt,
        "--image_dir", paths["image_dir"], "--json_path", paths["json_path"],
        "--output_path", out_csv,
    ])
    with open(out_csv) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 12
    assert set(rows[0]) == {"image_id", "predicted_label"}
    assert all(0 <= int(r["predicted_label"]) < 7 for r in rows)


def test_evaluate_cli(trained, tmp_path):
    from mdhs_tpu.cli.run_evaluate import main as eval_main

    root, paths, cfg_path, ckpt = trained
    report_path = str(tmp_path / "report.json")
    out = eval_main([
        "--config", cfg_path, "--model_path", ckpt, "--report_json", report_path,
    ])
    assert 0.0 <= out["accuracy"] <= 100.0
    assert os.path.exists(report_path)
    assert len(out["confusion_matrix"]) == 7


def test_ablation_cli(trained, tmp_path):
    from mdhs_tpu.cli.run_ablation_eval import main as abl_main

    root, paths, cfg_path, ckpt = trained
    out_yaml = str(tmp_path / "ablation.yml")
    results = abl_main([
        "--config", cfg_path, "--model_path", ckpt, "--output", out_yaml,
    ])
    assert set(results) == {"full_fusion", "image_only", "text_off"}
    with open(out_yaml) as f:
        data = yaml.safe_load(f)
    assert data["results"] == results


def test_analysis_cli(trained, tmp_path):
    from mdhs_tpu.cli.run_analysis import main as analysis_main

    root, paths, cfg_path, ckpt = trained
    out_dir = str(tmp_path / "analysis")
    result = analysis_main([
        "--config", cfg_path, "--model_path", ckpt,
        "--output_dir", out_dir, "--num_cam_images", "3",
    ])
    assert result["effective_rank"] > 0
    cams = glob.glob(os.path.join(out_dir, "cam_*.jpg"))
    assert len(cams) == 3


def test_export_serving_cli(trained, tmp_path):
    # AOT serving artifact: export, deserialize, run one batch; logits must
    # match the live eval step on the same inputs.
    import numpy as np

    from mdhs_tpu.cli.export_serving import load_and_run, main as export_main
    from mdhs_tpu.cli.common import build_trainer

    root, paths, cfg_path, ckpt = trained
    art = str(tmp_path / "model.jaxexport")
    info = export_main([
        "--config", cfg_path, "--model_path", ckpt, "--output", art,
        "--batch_size", "4", "--smoke_test",
    ])
    assert info["bytes"] > 0 and os.path.exists(art)
    assert info["smoke_finite"]

    trainer = build_trainer(cfg_path, setup_data=False)
    trainer.load_weights(ckpt)
    rng = np.random.default_rng(1)
    batch = {
        "image": rng.integers(0, 255, (4, 56, 56, 3)).astype(np.uint8),
        "input_ids": rng.integers(0, 100, (4, 16)).astype(np.int32),
        "attention_mask": np.ones((4, 16), np.int32),
    }
    if info["inputs"].get("tabular"):
        batch["tabular"] = rng.random(
            tuple(info["inputs"]["tabular"][0])).astype(np.float32)
    got = np.asarray(load_and_run(art, batch), np.float32)
    import jax.numpy as jnp
    want = np.asarray(
        trainer.eval_step_fn()(trainer.state, {k: jnp.asarray(v) for k, v in batch.items()}),
        np.float32,
    )
    assert got.shape == want.shape == (4, 7)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_export_serving_int8_preset(trained, tmp_path):
    """The int8 serving preset exports and runs through the AOT artifact
    (VERDICT r4 #7 regression; full-shape on-chip drift numbers live in
    benchmarks/serving_artifact_check.py + docs/PARITY.md). At this tiny
    shape the Pallas kernels gate off to the XLA int8 composite — what's
    pinned here is that the quantized eval graph itself survives the
    jax.export round trip and stays finite."""
    import numpy as np

    from mdhs_tpu.cli.export_serving import load_and_run, main as export_main

    root, paths, cfg_path, ckpt = trained
    art = str(tmp_path / "model_int8.jaxexport")
    info = export_main([
        "--config", cfg_path, "--model_path", ckpt, "--output", art,
        "--batch_size", "4", "--smoke_test",
        "--set", "model.fast_math=true",
        "--set", "model.text_encoder.quantize=int8",
    ])
    assert info["smoke_finite"]
    rng = np.random.default_rng(2)
    batch = {
        "image": rng.integers(0, 255, (4, 56, 56, 3)).astype(np.uint8),
        "input_ids": rng.integers(0, 100, (4, 16)).astype(np.int32),
        "attention_mask": np.ones((4, 16), np.int32),
    }
    got = np.asarray(load_and_run(art, batch), np.float32)
    assert got.shape == (4, 7) and np.isfinite(got).all()
