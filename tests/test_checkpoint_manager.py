"""TopKCheckpointManager retention semantics (reference scripts/train.py:412-430)
including restart/resume persistence of the index, and converter guards."""

import os

import numpy as np
import pytest

from mdhs_tpu.core.checkpoint import TopKCheckpointManager, load_checkpoint


def _state(v: float):
    return {"params": {"w": np.full((2,), v, np.float32)}}


def test_topk_retention(tmp_path):
    mgr = TopKCheckpointManager(str(tmp_path), k=3)
    for epoch, acc in enumerate([10.0, 30.0, 20.0, 5.0, 40.0]):
        mgr.maybe_save(epoch, acc, _state(acc))
    kept = sorted(f for f in os.listdir(tmp_path) if f.endswith(".msgpack"))
    assert len(kept) == 3
    # worst two (10.0 @0, 5.0 @3) evicted / never kept
    assert not any("_10.00" in f or "_5.00" in f for f in kept)
    assert mgr.best_path().endswith("epoch_4_val_acc_40.00.msgpack")


def test_topk_survives_restart(tmp_path):
    mgr = TopKCheckpointManager(str(tmp_path), k=3)
    for epoch, acc in enumerate([10.0, 30.0, 20.0]):
        mgr.maybe_save(epoch, acc, _state(acc))

    # a fresh manager in the same run dir (trainer restart + resume) must
    # see the pre-restart saves: best_path works and retention keeps
    # evicting instead of accumulating up to 2k files
    mgr2 = TopKCheckpointManager(str(tmp_path), k=3)
    assert mgr2.best_path() == mgr.best_path()
    mgr2.maybe_save(3, 25.0, _state(25.0))
    kept = sorted(f for f in os.listdir(tmp_path) if f.endswith(".msgpack"))
    assert len(kept) == 3
    assert not any("_10.00" in f for f in kept)  # pre-restart worst evicted
    assert load_checkpoint(mgr2.best_path())["params"]["w"][0] == 30.0

    # below-top-k metric after restart: not saved
    assert mgr2.maybe_save(4, 1.0, _state(1.0)) is None


@pytest.mark.parametrize(
    "corrupt",
    [
        '[{"path": "epoch_0_val_acc_10.00.msgpack", "metric": null}]',
        '{"not": "a list"}',
        "not json at all {",
    ],
)
def test_corrupt_index_tolerated(tmp_path, corrupt):
    # resume must survive an unreadable/corrupt checkpoints.json (null
    # metric -> TypeError from float(None); non-list JSON -> TypeError on
    # element access; bad JSON -> ValueError) instead of crashing
    (tmp_path / "checkpoints.json").write_text(corrupt)
    mgr = TopKCheckpointManager(str(tmp_path), k=3)
    assert mgr.entries == []
    assert mgr.maybe_save(0, 10.0, _state(10.0)) is not None


def test_kan_bank_expert_count_guard():
    from mdhs_tpu.core.convert import _convert_kan_bank

    sd = {}
    for e in range(2):
        for i in range(2):
            sd[f"moe.experts.{e}.layers.{i}.base_weight"] = np.zeros((4, 3), np.float32)
            sd[f"moe.experts.{e}.layers.{i}.spline_weight"] = np.zeros(
                (4, 3, 8), np.float32
            )
    # inferred count
    params, _ = _convert_kan_bank(sd, "moe.experts.", None)
    assert params["layer_0"]["base_weight"].shape == (2, 4, 3)
    # explicit mismatch fails loudly instead of truncating the bank
    with pytest.raises(ValueError, match="2 experts"):
        _convert_kan_bank(sd, "moe.experts.", 4)


def test_connext_mamba_fusion_import_guard():
    from mdhs_tpu.core.convert import convert_connext_full

    with pytest.raises(ValueError, match="mamba-fusion"):
        convert_connext_full({}, use_mamba_fusion=True)
