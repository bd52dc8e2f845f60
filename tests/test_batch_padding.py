"""Padded-tail batch semantics.

The DataLoader pads a short last batch by repeating its first record and
marks reality via n_valid (loader.py). These tests pin that the loss /
metric surfaces ignore the padded rows — the static-shape equivalent of
torch's drop_last=False short batch (reference scripts/train.py:353,
DataLoader default) — and that the prefetch worker dies when the consumer
abandons an epoch.
"""

import threading
import time

import jax.numpy as jnp
import numpy as np
import pytest

from mdhs_tpu.train.losses import (
    ce_loss,
    focal_loss,
    mibf_loss,
    supcon_loss,
)


def _pad(a, n_pad):
    return np.concatenate([a, np.repeat(a[:1], n_pad, axis=0)])


@pytest.mark.parametrize("with_weights", [False, True])
def test_masked_ce_equals_short_batch(with_weights):
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(5, 7)).astype(np.float32)
    labels = rng.integers(0, 7, size=5).astype(np.int32)
    w = jnp.asarray(rng.uniform(0.5, 2.0, size=7).astype(np.float32)) if with_weights else None

    short = ce_loss(jnp.asarray(logits), jnp.asarray(labels), class_weights=w)

    pl, ll = _pad(logits, 3), _pad(labels, 3)
    mask = jnp.asarray((np.arange(8) < 5).astype(np.float32))
    padded = ce_loss(jnp.asarray(pl), jnp.asarray(ll), class_weights=w, sample_mask=mask)
    np.testing.assert_allclose(float(padded), float(short), rtol=1e-6)


def test_masked_focal_equals_short_batch():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(6, 4)).astype(np.float32)
    labels = rng.integers(0, 4, size=6).astype(np.int32)
    short = focal_loss(jnp.asarray(logits), jnp.asarray(labels))
    mask = jnp.asarray((np.arange(9) < 6).astype(np.float32))
    padded = focal_loss(
        jnp.asarray(_pad(logits, 3)), jnp.asarray(_pad(labels, 3)), sample_mask=mask
    )
    np.testing.assert_allclose(float(padded), float(short), rtol=1e-6)


def test_masked_supcon_equals_short_batch():
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(6, 16)).astype(np.float32)
    labels = rng.integers(0, 3, size=6).astype(np.int32)
    short = supcon_loss(jnp.asarray(feats), jnp.asarray(labels))
    mask = jnp.asarray((np.arange(8) < 6).astype(np.float32))
    padded = supcon_loss(
        jnp.asarray(_pad(feats, 2)), jnp.asarray(_pad(labels, 2)), sample_mask=mask
    )
    # padded duplicates would otherwise act as spurious same-class positives
    np.testing.assert_allclose(float(padded), float(short), rtol=1e-5)


def test_masked_mp_loss_equals_short_batch():
    rng = np.random.default_rng(3)
    outs = {
        k: rng.normal(size=(5, 6)).astype(np.float32)
        for k in ("image", "text", "image_text")
    }
    labels = rng.integers(0, 6, size=5).astype(np.int32)
    short = mibf_loss({k: jnp.asarray(v) for k, v in outs.items()}, jnp.asarray(labels))
    mask = jnp.asarray((np.arange(8) < 5).astype(np.float32))
    padded = mibf_loss(
        {k: jnp.asarray(_pad(v, 3)) for k, v in outs.items()},
        jnp.asarray(_pad(labels, 3)),
        sample_mask=mask,
    )
    np.testing.assert_allclose(float(padded), float(short), rtol=1e-6)


def test_loader_abandoned_epoch_stops_worker():
    from mdhs_tpu.data.loader import DataLoader

    class DS:
        labels = [0] * 64

        def __len__(self):
            return 64

        def __getitem__(self, i):
            return {"x": np.zeros((4,), np.float32), "label": np.int32(0)}

    loader = DataLoader(DS(), batch_size=4, prefetch=2)
    before = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # the consumer abandons the epoch (break / exception)
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "prefetch worker leaked"


def test_neighbor_padded_fallback():
    from mdhs_tpu.data.datasets import MultimodalDataset, neighbor_name

    assert neighbor_name("slice_007.png", 1) == "slice_8.png"  # reference intent
    assert neighbor_name("slice_007.png", 1, pad=True) == "slice_008.png"
    assert neighbor_name("slice_007.png", -7, pad=True) == "slice_000.png"

    class Fake:
        def __init__(self, present):
            self.present = present

        def _find_image(self, nid):
            return nid if nid in self.present else None

    resolve = MultimodalDataset._neighbor
    # unpadded neighbor exists: reference-intent name wins
    assert resolve(Fake({"slice_8.png"}), "slice_007.png", 1) == "slice_8.png"
    # only the zero-padded neighbor exists: padded fallback finds it
    assert resolve(Fake({"slice_008.png"}), "slice_007.png", 1) == "slice_008.png"
    # neither exists: degrade to the center slice (reference :230-232)
    assert resolve(Fake(set()), "slice_007.png", 1) == "slice_007.png"
