"""ServingModel runtime semantics: load-once artifact serving with padding
and pipelined streaming (reference per-batch loop: scripts/predict.py:44-81).

Numerics of the exported graph itself are pinned in test_cli_e2e
(AOT == live eval step); here we pin the *runtime* around it: stream ==
sync == one-shot loader, partial-batch padding, in-order results, input
validation. Random-init weights suffice — no training needed."""

import os

import numpy as np
import pytest

from mdhs_tpu.core.config import Config
from mdhs_tpu.data.synthetic import generate_synthetic_dataset, synthetic_config


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    root = tmp_path_factory.mktemp("serving")
    # 6 images with an exported batch size of 4 -> the serve CLI must handle
    # a padded tail batch (4 + 2)
    paths = generate_synthetic_dataset(str(root), num_images=6, image_size=48)
    cfg = synthetic_config(paths, str(root), batch_size=4, num_epochs=1,
                           max_length=16)
    cfg["data"]["canvas"] = 56
    cfg["data"]["image_size"] = 48
    cfg_path = os.path.join(str(root), "config.yml")
    Config(cfg).save(cfg_path)

    from mdhs_tpu.cli.export_serving import main as export_main

    art = os.path.join(str(root), "model.jaxexport")
    export_main(["--config", cfg_path, "--output", art, "--batch_size", "4"])
    return art, cfg_path, paths


def _batch(rng, n):
    return {
        "image": rng.integers(0, 255, (n, 56, 56, 3)).astype(np.uint8),
        "input_ids": rng.integers(0, 100, (n, 16)).astype(np.int32),
        "attention_mask": np.ones((n, 16), np.int32),
    }


def test_predict_matches_one_shot_loader(artifact):
    from mdhs_tpu.cli.export_serving import load_and_run
    from mdhs_tpu.serving import ServingModel

    artifact, _, _ = artifact
    model = ServingModel.load(artifact)
    assert model.batch_size == 4
    batch = _batch(np.random.default_rng(0), 4)
    got = model.predict(batch)
    want = np.asarray(load_and_run(artifact, batch), np.float32)
    np.testing.assert_allclose(got, want, atol=0)  # same executable, same bytes


def test_partial_batch_padding(artifact):
    from mdhs_tpu.serving import ServingModel

    artifact, _, _ = artifact
    model = ServingModel.load(artifact)
    full = _batch(np.random.default_rng(1), 4)
    part = {k: v[:2] for k, v in full.items()}
    got = model.predict(part)
    want = model.predict(full)[:2]
    assert got.shape == (2, 7)
    np.testing.assert_allclose(got, want, atol=0)  # rows independent of pad


def test_stream_matches_sync_in_order(artifact):
    from mdhs_tpu.serving import ServingModel

    artifact, _, _ = artifact
    model = ServingModel.load(artifact)
    rng = np.random.default_rng(2)
    batches = [_batch(rng, 4), _batch(rng, 4), _batch(rng, 2)]
    want = [model.predict(b) for b in batches]
    for depth in (0, 2, 8):
        got = list(model.predict_stream(iter(batches), depth=depth))
        assert [g.shape for g in got] == [(4, 7), (4, 7), (2, 7)]
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, atol=0)


def test_input_validation(artifact):
    from mdhs_tpu.serving import ServingModel

    artifact, _, _ = artifact
    model = ServingModel.load(artifact)
    batch = _batch(np.random.default_rng(3), 4)
    with pytest.raises(KeyError, match="input_ids"):
        model.predict({k: v for k, v in batch.items() if k != "input_ids"})
    with pytest.raises(ValueError, match="exceeds exported batch size"):
        model.predict(_batch(np.random.default_rng(4), 5))
    bad = dict(batch)
    bad["image"] = batch["image"][:, :32]
    with pytest.raises(ValueError, match="artifact expects"):
        model.predict(bad)


def test_run_serve_cli_matches_live_prediction(artifact, tmp_path):
    """run_serve.py (artifact-only, no model code) produces the same
    submission CSV as the live prediction path on the same weights (the
    export fixture and a fresh build_trainer share training.seed, so init
    is identical — same invariant serving_artifact_check.py relies on)."""
    import csv

    from mdhs_tpu.cli.common import build_trainer, run_prediction
    from mdhs_tpu.cli.run_serve import main as serve_main

    art, cfg_path, paths = artifact
    out_csv = str(tmp_path / "served.csv")
    ids, preds = serve_main([
        "--artifact", art, "--config", cfg_path,
        "--image_dir", paths["image_dir"], "--json_path", paths["json_path"],
        "--output_path", out_csv,
    ])
    assert len(ids) == len(preds) == 6

    trainer = build_trainer(cfg_path, setup_data=False)
    want_ids, want_preds, _ = run_prediction(
        trainer, trainer.make_test_loader(paths["image_dir"], paths["json_path"])
    )
    assert list(ids) == list(want_ids)
    assert list(preds) == list(want_preds)

    with open(out_csv) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 6
    assert set(rows[0]) == {"image_id", "predicted_label"}
