"""Advanced baseline modes end-to-end: gate, tabular, sequence (5-D),
multi-view, pseudo-2.5D, global-local — the reference's config-zoo toggles
(SURVEY.md §2.5, configs/spine/*)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdhs_tpu.core.config import Config
from mdhs_tpu.data.synthetic import generate_synthetic_dataset, synthetic_config


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("adv")
    paths = generate_synthetic_dataset(
        str(root), num_images=10, image_size=48, num_classes=6, sequence_groups=True
    )
    return root, paths


def make_cfg(root, paths, **sections):
    cfg = synthetic_config(paths, str(root), num_classes=6, batch_size=2,
                          num_epochs=1, max_length=16)
    cfg["data"]["canvas"] = 56
    cfg["data"]["image_size"] = 48
    for key, val in sections.items():
        parts = key.split("__")
        node = cfg
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = val
    return Config(cfg)


def run_one_step(cfg, tmp_path, name):
    from mdhs_tpu.train.trainer import Trainer

    tr = Trainer(cfg, family="baseline", output_dir=str(tmp_path / name))
    step = tr.train_step_fn()
    batch = next(iter(tr.train_loader))
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "image_id"}
    tr.state, m = step(tr.state, jb, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"])), name
    logits = tr.eval_step_fn()(tr.state, jb)
    assert logits.shape[-1] == 6
    return tr


def test_gate_and_tabular(synth, tmp_path):
    root, paths = synth
    cfg = make_cfg(
        root, paths,
        model__gate={"enabled": True, "hidden_dim": 16, "use_entropy": True,
                     "local_mode": "image_only", "context_mode": "full"},
        model__tabular={"enabled": True, "hidden_dim": 8,
                        "fields": ["age", "sex", "localization"]},
    )
    run_one_step(cfg, tmp_path, "gate_tab")


def test_sequence_lstm_5d(synth, tmp_path):
    root, paths = synth
    cfg = make_cfg(
        root, paths,
        data__sequence={"enabled": True, "offsets": [-1, 0, 1]},
        model__sequence_encoder={"enabled": True, "type": "lstm", "hidden_dim": 16},
    )
    tr = run_one_step(cfg, tmp_path, "seq")
    batch = next(iter(tr.train_loader))
    assert batch["image"].ndim == 5 and batch["image"].shape[1] == 3


def test_multiview_transformer(synth, tmp_path):
    root, paths = synth
    cfg = make_cfg(
        root, paths,
        data__multi_view={"enabled": True, "num_views": 2},
        model__sequence_encoder={"enabled": True, "type": "transformer",
                                 "num_heads": 2, "hidden_dim": 16},
    )
    run_one_step(cfg, tmp_path, "mview")


def test_pseudo_2p5d(synth, tmp_path):
    root, paths = synth
    cfg = make_cfg(root, paths, data__pseudo_2p5d={"enabled": True})
    tr = run_one_step(cfg, tmp_path, "p25d")
    batch = next(iter(tr.train_loader))
    assert batch["image"].shape[-1] == 3  # grayscale neighbors stacked as RGB


def test_global_local(synth, tmp_path):
    root, paths = synth
    cfg = make_cfg(
        root, paths,
        model__global_local={"enabled": True, "crop_ratio": 0.6, "combine": "concat"},
    )
    run_one_step(cfg, tmp_path, "gl")


def test_neighbor_name():
    from mdhs_tpu.data.datasets import neighbor_name

    assert neighbor_name("case003_2.jpg", 1) == "case003_3.jpg"
    assert neighbor_name("case003_0.jpg", -1) == "case003_0.jpg"  # clamped
    assert neighbor_name("img42.png", 2) == "img44.png"
    assert neighbor_name("noindex.jpg", 1) == "noindex.jpg"


def test_hierarchical_fusion_e2e(synth, tmp_path):
    root, paths = synth
    cfg = make_cfg(root, paths, model__fusion_type="hierarchical")
    run_one_step(cfg, tmp_path, "hier")


def test_stain_normalization_e2e(synth, tmp_path):
    root, paths = synth
    cfg = make_cfg(
        root, paths,
        data__stain_normalization={"enabled": True,
                                   "target_mean": [150.0, 140.0, 140.0],
                                   "target_std": [20.0, 20.0, 20.0]},
    )
    run_one_step(cfg, tmp_path, "stain")


def test_tabular_predict_only_trainer(synth, tmp_path):
    """setup_data=False (predict/eval path) must still size the tabular
    branch from metadata_csv (reference scripts/predict.py:103)."""
    import jax.numpy as jnp

    from mdhs_tpu.train.trainer import Trainer

    root, paths = synth
    cfg = make_cfg(
        root, paths,
        model__tabular={"enabled": True, "hidden_dim": 8,
                        "fields": ["age", "sex", "localization"]},
    )
    tr = Trainer(cfg, family="baseline", output_dir=str(tmp_path / "tabpred"),
                 setup_data=False)
    assert tr._tabular_dim > 0
    loader = tr.make_test_loader()
    batch = next(iter(loader))
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "image_id"}
    logits = tr.eval_step_fn()(tr.state, jb)
    assert logits.shape[-1] == 6


def test_canvas_cache(synth):
    from mdhs_tpu.data.datasets import DatasetOptions, MultimodalDataset
    from mdhs_tpu.data.tokenizer import WordPieceTokenizer

    root, paths = synth
    tok = WordPieceTokenizer.synthetic()
    ds = MultimodalDataset(
        paths["image_dir"], paths["json_path"], paths["label_csv"], tok,
        DatasetOptions(max_length=8, canvas=56, cache=True),
    )
    a = ds[0]["image"]
    assert len(ds._canvas_cache) == 1
    b = ds[0]["image"]
    assert a is b  # cached object reused


def test_host_augment_e2e(synth, tmp_path):
    """Strict torchvision-parity host augmentation path (data.augment.host)."""
    root, paths = synth
    cfg = make_cfg(root, paths, data__augment={"host": True})
    tr = run_one_step(cfg, tmp_path, "hostaug")
    batch = next(iter(tr.train_loader))
    # host path emits image_size-sized, per-epoch-random images
    assert batch["image"].shape[1:] == (48, 48, 3)
    batch2 = next(iter(tr.train_loader))
    assert not (batch["image"] == batch2["image"]).all()


def test_host_augment_functions():
    import random

    import numpy as np
    from PIL import Image

    from mdhs_tpu.data.augment_host import color_jitter, host_train_transform, random_resized_crop

    rng = random.Random(0)
    img = Image.fromarray(np.random.default_rng(0).integers(0, 255, (80, 60, 3), np.uint8))
    out = host_train_transform(img, 48, rng)
    assert out.shape == (48, 48, 3) and out.dtype == np.uint8
    crop = random_resized_crop(img, 32, rng)
    assert crop.size == (32, 32)
    arr = np.asarray(img, np.float64)
    jit = color_jitter(arr, rng)
    assert jit.shape == arr.shape
    assert 0 <= jit.min() and jit.max() <= 255


def test_tta_with_tabular(synth, tmp_path):
    """TTA must tile tabular (and LLM-hidden) inputs to the variant batch
    (reference predict.py:63-70 runs TTA on tabular-enabled models); a
    closure-captured tabular stayed at B while images became V*B."""
    root, paths = synth
    cfg = make_cfg(
        root, paths,
        model__tabular={"enabled": True, "hidden_dim": 8,
                        "fields": ["age", "sex", "localization"]},
    )
    tr = run_one_step(cfg, tmp_path, "tta_tab")
    batch = next(iter(tr.train_loader))
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "image_id"}
    step = tr.eval_step_fn(tta=True, tta_transforms=("hflip", "vflip", "rot90"))
    logits = step(tr.state, jb)
    assert logits.shape == (2, 6)
    assert np.isfinite(np.asarray(logits, np.float32)).all()
