"""training.remat is numerics-preserving.

The remat knob (core/remat.py) must change ONLY what the backward pass
saves: forward values are identical, param trees are identical (checkpoint
compatibility across modes), and gradients agree to fp-reassociation noise.
Covers all three tower types (ResNet via MIBF, BERT via both, ConvNeXt via
ConNexT) at tiny shapes.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdhs_tpu.models.bert import BertConfig
from mdhs_tpu.models.connext import ConNexTClassifier
from mdhs_tpu.models.mibf import MIBFNet

MODES = ("selective", "full")


def _tree_equal_structure(a, b):
    return jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)


def _max_rel_delta(a, b, atol=1e-6):
    """Worst per-leaf relative delta, with an absolute floor for leaves whose
    value is analytically zero but fp-noise-valued (e.g. attention key-bias
    gradients, which cancel in softmax and sit at ~1e-8)."""
    deltas = []
    for la, lb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        scale = max(float(jnp.max(jnp.abs(la))), 1e-12)
        d = max(float(jnp.max(jnp.abs(la - lb))) - atol, 0.0)
        deltas.append(d / scale)
    return max(deltas) if deltas else 0.0  # e.g. no-BN towers: empty stats tree


def _mibf(remat):
    bert = dataclasses.replace(BertConfig.tiny(), remat=remat)
    return MIBFNet(num_labels=3, bert=bert, dtype=jnp.float32, remat=remat)


def _connext(remat):
    bert = dataclasses.replace(BertConfig.tiny(), remat=remat)
    return ConNexTClassifier(
        num_labels=3, convnext_variant="test_tiny", fusion_dim=32,
        bert=bert, dtype=jnp.float32, remat=remat,
    )


@pytest.fixture(scope="module", autouse=True)
def _register_tiny_convnext():
    from mdhs_tpu.models.convnext import register_convnext_variant

    register_convnext_variant("test_tiny", depths=(1, 1), dims=(16, 32))


def _loss_and_grads(model, variables, batch, train_inputs):
    images, ids, mask = train_inputs

    def loss_fn(params):
        out, new_vars = model.apply(
            {**variables, "params": params}, images, ids, mask,
            train=True, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(7)},
            mutable=["batch_stats"],
        )
        if isinstance(out, dict):
            logits = out["image_text"]
        elif isinstance(out, tuple):
            logits = out[0]
        else:
            logits = out
        return jnp.sum(logits.astype(jnp.float32) ** 2), new_vars

    (loss, new_vars), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(variables["params"])
    return loss, grads, new_vars


@pytest.mark.parametrize("family", ["mibf", "connext"])
def test_remat_modes_match_baseline(family):
    build = {"mibf": _mibf, "connext": _connext}[family]
    B, H, L = 2, 32, 8
    images = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, H, H, 3)).astype(np.float32)
    )
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 500, (B, L), np.int32))
    mask = jnp.ones((B, L), jnp.int32)

    ref_model = build("none")
    variables = jax.jit(
        lambda r: ref_model.init(
            {"params": r, "dropout": jax.random.PRNGKey(1)}, images, ids, mask
        )
    )(jax.random.PRNGKey(0))
    variables = {k: v for k, v in variables.items() if k != "perturbations"}
    ref_loss, ref_grads, ref_stats = _loss_and_grads(
        ref_model, variables, None, (images, ids, mask)
    )

    for mode in MODES:
        model = build(mode)
        # identical param tree: checkpoints are interchangeable across modes
        v2 = jax.eval_shape(
            lambda r: model.init(
                {"params": r, "dropout": jax.random.PRNGKey(1)}, images, ids, mask
            ),
            jax.random.PRNGKey(0),
        )
        assert _tree_equal_structure(
            v2["params"], variables["params"]
        ), f"{family}/{mode}: param tree changed under remat"

        loss, grads, stats = _loss_and_grads(model, variables, None, (images, ids, mask))
        assert np.isfinite(float(loss))
        assert abs(float(loss - ref_loss)) <= 1e-5 * max(abs(float(ref_loss)), 1.0)
        # gradients: identical modulo fp reassociation in the recompute
        assert _max_rel_delta(grads, ref_grads) < 5e-5, f"{family}/{mode}"
        # BN running stats update identically (forward is not rematerialized)
        assert _max_rel_delta(stats, ref_stats) < 1e-6, f"{family}/{mode}"


def test_trainer_accepts_remat_knob(tmp_path):
    from mdhs_tpu.core.config import Config
    from mdhs_tpu.data.synthetic import generate_synthetic_dataset, synthetic_config
    from mdhs_tpu.train.trainer import Trainer

    root = tmp_path / "synth"
    paths = generate_synthetic_dataset(str(root), num_images=8, image_size=48, num_classes=6)
    cfg = synthetic_config(paths, str(root), num_classes=6, batch_size=4,
                           num_epochs=1, max_length=16)
    cfg["data"]["canvas"] = 56
    cfg["data"]["image_size"] = 48
    cfg["training"]["remat"] = "selective"
    tr = Trainer(Config(cfg), family="mibf", output_dir=str(tmp_path / "out"))
    assert tr.model.remat == "selective"
    assert tr.model.bert.remat == "selective"
    step = tr.train_step_fn()
    batch = next(iter(tr.train_loader))
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "image_id"}
    tr.state, m = step(tr.state, jb, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))

    cfg["training"]["remat"] = "bogus"
    with pytest.raises(ValueError, match="training.remat"):
        Trainer(Config(cfg), family="mibf", output_dir=str(tmp_path / "out2"))
