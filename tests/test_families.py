"""MIBF-Net and ConNexT family tests: forward shapes, losses, one train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdhs_tpu.core.config import Config
from mdhs_tpu.data.synthetic import generate_synthetic_dataset, synthetic_config


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_fam")
    paths = generate_synthetic_dataset(str(root), num_images=8, image_size=48, num_classes=6)
    return root, paths


def make_cfg(root, paths, num_classes=6, **extra_model):
    cfg = synthetic_config(paths, str(root), num_classes=num_classes, batch_size=4,
                          num_epochs=1, max_length=16)
    cfg["data"]["canvas"] = 56
    cfg["data"]["image_size"] = 48
    cfg["model"].update(extra_model)
    return Config(cfg)


def test_mibf_train_step(synth, tmp_path):
    from mdhs_tpu.train.trainer import Trainer

    root, paths = synth
    cfg = make_cfg(root, paths)
    tr = Trainer(cfg, family="mibf", output_dir=str(tmp_path / "mibf"))
    step = tr.train_step_fn()
    batch = next(iter(tr.train_loader))
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "image_id"}
    tr.state, m = step(tr.state, jb, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    logits = tr.eval_step_fn()(tr.state, jb)
    assert logits.shape == (4, 6)


def test_mibf_loss_modes():
    from mdhs_tpu.train.losses import mibf_loss

    key = jax.random.PRNGKey(0)
    outputs = {
        "image": jax.random.normal(key, (4, 6)),
        "text": jax.random.normal(key, (4, 6)),
        "image_text": jax.random.normal(key, (4, 6)),
    }
    labels = jnp.array([0, 1, 2, 3])
    for mode in ("KL_loss", "textimage_loss", "text_image_textimage_loss"):
        v = float(mibf_loss(outputs, labels, mode))
        assert np.isfinite(v) and v > 0


def test_connext_moe_train_step(synth, tmp_path):
    from mdhs_tpu.train.trainer import Trainer

    root, paths = synth
    cfg = make_cfg(root, paths)
    cfg.set("model.image_encoder.variant", "tiny")
    cfg.set("model.moe", {"enabled": True, "num_experts": 2, "k": 1,
                          "balance_weight": 0.01})
    tr = Trainer(cfg, family="connext", output_dir=str(tmp_path / "cnx"))
    step = tr.train_step_fn()
    batch = next(iter(tr.train_loader))
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "image_id"}
    tr.state, m = step(tr.state, jb, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    logits = tr.eval_step_fn()(tr.state, jb)
    assert logits.shape == (4, 6)


def test_connext_llm_hidden_mamba_fusion_e2e(synth, tmp_path):
    """LLM hidden-state fusion path end-to-end (VERDICT r4 #5): a synthetic
    per-image hidden-state JSON at the reference's real dim (3584), with one
    image missing to exercise zero-fill (reference
    ConNexT/dataset/pl_datset.py:94-158), feeds MultimodalMamba through the
    connext family: dataset record shapes, one train step, eval logits, and
    the predict CLI."""
    import csv
    import json
    import os

    from mdhs_tpu.core.checkpoint import save_checkpoint
    from mdhs_tpu.train.trainer import Trainer

    root, paths = synth
    DIM = 3584
    rng = np.random.default_rng(0)
    img_ids = sorted(os.listdir(paths["image_dir"]))
    assert len(img_ids) >= 2
    missing = img_ids[0]
    hidden = {
        name: {
            "first_hidden_state": rng.normal(size=DIM).astype(np.float32).tolist(),
            "last_hidden_state": rng.normal(size=DIM).astype(np.float32).tolist(),
        }
        for name in img_ids[1:]
    }
    jpath = str(tmp_path / "llm_hidden.json")
    with open(jpath, "w") as f:
        json.dump(hidden, f)

    cfg = make_cfg(root, paths)
    cfg.set("model.image_encoder.variant", "tiny")
    cfg.set("model.mamba_fusion", {"enabled": True})
    cfg.set("data.llm_hidden_json", jpath)
    cfg.set("data.llm_hidden_dim", DIM)
    tr = Trainer(cfg, family="connext", output_dir=str(tmp_path / "cnx_llm"))

    # dataset-level: real-shaped vectors, zero-fill for the missing image
    ds = tr.train_loader.dataset
    by_id = {m["image_id"]: i for i, m in enumerate(ds.metadata)}
    rec_missing = ds[by_id[missing]]
    assert rec_missing["first_hidden"].shape == (DIM,)
    assert not rec_missing["first_hidden"].any(), "missing entry must zero-fill"
    rec_present = ds[by_id[img_ids[1]]]
    np.testing.assert_allclose(
        rec_present["last_hidden"],
        np.asarray(hidden[img_ids[1]]["last_hidden_state"], np.float32),
    )
    assert rec_present["first_hidden"].any()

    # one real train step + eval through the mamba-fusion forward
    step = tr.train_step_fn()
    batch = next(iter(tr.train_loader))
    assert batch["first_hidden"].shape == (4, DIM)
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "image_id"}
    tr.state, m = step(tr.state, jb, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    logits = tr.eval_step_fn()(tr.state, jb)
    assert logits.shape == (4, 6)
    assert np.isfinite(np.asarray(logits, np.float32)).all()

    # predict CLI consumes the same hidden-state JSON for the test split
    from mdhs_tpu.cli.run_predict import main as predict_main

    ckpt = str(tmp_path / "cnx_llm" / "last.msgpack")
    save_checkpoint(ckpt, tr.checkpoint_state())
    cfg_path = str(tmp_path / "cnx_llm_cfg.yml")
    cfg.save(cfg_path)
    out_csv = str(tmp_path / "cnx_llm_sub.csv")
    predict_main([
        "--config", cfg_path, "--model_path", ckpt, "--output_path", out_csv,
        "--family", "connext",
    ])
    with open(out_csv) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == len(img_ids)
    assert all(0 <= int(r["predicted_label"]) < 6 for r in rows)


def test_gradcam_on_baseline(synth, tmp_path):
    from mdhs_tpu.cli.run_analysis import zero_perturbations
    from mdhs_tpu.analysis.gradcam import gradcam
    from mdhs_tpu.train.trainer import Trainer

    root, paths = synth
    cfg = make_cfg(root, paths)
    tr = Trainer(cfg, family="baseline", output_dir=str(tmp_path / "cam"))
    batch = next(iter(tr.val_loader))
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "image_id"}
    images = tr._preprocess_eval(jb["image"])
    model = tr.model
    perts = zero_perturbations(model, images, jb["input_ids"], jb["attention_mask"])

    def fwd(v):
        return model.apply(
            v, images, jb["input_ids"], jb["attention_mask"],
            method=model.logits_and_taps,
        )

    cams, logits = gradcam(fwd, {**tr.variables(), "perturbations": perts},
                           image_size=48)
    assert cams.shape == (4, 48, 48)
    assert cams.min() >= 0.0 and cams.max() <= 1.0 + 1e-6
    assert np.abs(cams).sum() > 0  # non-degenerate
