"""Config system + config zoo integrity tests."""

import glob
import os

import pytest

from mdhs_tpu.core.config import Config, load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dotted_access_and_overrides():
    cfg = Config({"a": {"b": {"c": 1}}, "x": 2})
    assert cfg.get("a.b.c") == 1
    assert cfg.get("a.b.missing", "d") == "d"
    cfg2 = cfg.with_overrides(["a.b.c=7", "new.key=true", "f=0.5"])
    assert cfg2.get("a.b.c") == 7
    assert cfg2.get("new.key") is True
    assert cfg2.get("f") == 0.5
    assert cfg.get("a.b.c") == 1  # original untouched


def test_deep_merge():
    base = Config({"m": {"x": 1, "y": 2}, "k": [1, 2]})
    merged = base.merged({"m": {"y": 3, "z": 4}})
    assert merged.get("m.x") == 1
    assert merged.get("m.y") == 3
    assert merged.get("m.z") == 4


@pytest.mark.parametrize(
    "path", sorted(glob.glob(os.path.join(REPO, "configs", "*", "*.yml")))
)
def test_config_zoo_loads(path):
    cfg = load_config(path)
    assert cfg.get("model.num_classes") in (2, 6, 7)
    assert cfg.get("training.batch_size") > 0
    assert cfg.get("output.run_name")
    # every zoo config must build a valid model config
    from mdhs_tpu.models.baseline import BaselineConfig

    mc = BaselineConfig.from_config(cfg, tabular_input_dim=11)
    assert mc.hidden_dim > 0


def test_chained_base_resolution():
    cfg = load_config(os.path.join(REPO, "configs", "spine", "spine_gate_entropy_v1.yml"))
    # from common/base.yml through spine_base_v1.yml
    assert cfg.get("training.optimizer") == "AdamW"
    assert cfg.get("model.num_classes") == 6
    assert cfg.get("model.gate.enabled") is True


def test_save_roundtrip(tmp_path):
    cfg = Config({"a": {"b": 1}})
    p = tmp_path / "c.yml"
    cfg.save(str(p))
    assert Config.from_yaml(str(p)) == cfg
