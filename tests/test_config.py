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


def test_serving_preset_resolves_quantized_tower():
    """configs/serving/mibf_ham_serving.yml is the shipped int8 serving
    preset: it must chain through the MIBF base config and reach
    BertConfig with the a8w8 tower + fast_math enabled, without touching
    the training-side defaults (exact parity stays the training mode)."""
    from mdhs_tpu.train.trainer import bert_config_from

    cfg = load_config(os.path.join(REPO, "configs", "serving", "mibf_ham_serving.yml"))
    bc = bert_config_from(cfg, vocab_size=30522)
    assert bc.quantize == "int8"
    assert bc.fast_math is True
    assert cfg.get("inference.batch_size") == 512
    # the preset inherits the MIBF HAM training config unchanged
    base = load_config(os.path.join(REPO, "configs", "mibf", "mibf_ham.yml"))
    assert bert_config_from(base, vocab_size=30522).quantize == "none"
    assert cfg.get("model.num_classes") == base.get("model.num_classes") == 7
