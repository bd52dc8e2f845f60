"""Multi-device sharding validation on a virtual 8-device CPU mesh.

The axon TPU plugin pins this process to the single real chip, so the
virtual-CPU mesh check runs in a clean subprocess (PYTHONPATH without the
plugin's sitecustomize, JAX_PLATFORMS=cpu,
xla_force_host_platform_device_count=8) — the same environment the driver
uses for dryrun_multichip.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    return env


def test_dryrun_multichip_8cpu():
    code = (
        "import __graft_entry__ as g; g.dryrun_multichip(8); print('OK8')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=_clean_env(),
        capture_output=True, text=True, timeout=540,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK8" in out.stdout


def test_trainer_fit_multidevice_8cpu():
    """Trainer.fit itself (not a hand-rolled step) must run on a >1-device
    mesh: params placed by shard_params, batch dp-sharded, loss finite.
    Covers baseline (full fit incl. validate) + mibf (one train step)."""
    code = """
import math, os, tempfile
import jax
from jax.sharding import PartitionSpec as P
from mdhs_tpu.core.config import Config
from mdhs_tpu.data.synthetic import generate_synthetic_dataset, synthetic_config
from mdhs_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from mdhs_tpu.train.trainer import Trainer

assert len(jax.devices()) == 8
with tempfile.TemporaryDirectory() as tmp:
    paths = generate_synthetic_dataset(tmp, num_images=16, image_size=48)
    cd = synthetic_config(paths, tmp, batch_size=8, num_epochs=1, max_length=16)
    cd["data"]["canvas"] = 56
    cd["data"]["image_size"] = 48
    cd["model"]["classifier_type"] = "moe"
    cd["model"]["moe"] = {"num_experts": 2, "k": 1}
    cd["parallel"] = {"n_model": 2}
    tr = Trainer(Config(cd), family="baseline", output_dir=os.path.join(tmp, "run"))
    assert dict(tr.mesh.shape) == {DATA_AXIS: 4, MODEL_AXIS: 2}
    leaves = jax.tree_util.tree_leaves_with_path(tr.state.params)
    assert any(MODEL_AXIS in str(l.sharding.spec) for _, l in leaves), \\
        "expected at least one model-axis-sharded param"
    batch = next(iter(tr.train_loader))
    jb = tr._device_batch(batch)
    assert jb["image"].sharding.spec == P(DATA_AXIS)
    state = tr.fit()
    assert int(state.step) == len(tr.train_loader)
    print("OK-BASELINE-FIT")

    # MIBF family: one real train step on the pure-dp mesh
    cd2 = synthetic_config(paths, tmp, batch_size=8, num_epochs=1, max_length=16)
    cd2["data"]["canvas"] = 56
    cd2["data"]["image_size"] = 48
    cd2["model"]["num_classes"] = 7
    tr2 = Trainer(Config(cd2), family="mibf", output_dir=os.path.join(tmp, "run2"))
    assert tr2.mesh.size == 8
    step = tr2.train_step_fn()
    b = tr2._device_batch(next(iter(tr2.train_loader)))
    tr2.state, m = step(tr2.state, b, tr2.rng)
    assert math.isfinite(float(m["loss"]))
    print("OK-MIBF-STEP")
"""
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=_clean_env(),
        capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "OK-BASELINE-FIT" in out.stdout
    assert "OK-MIBF-STEP" in out.stdout


def test_mesh_and_batch_sharding():
    code = """
import jax, numpy as np
from jax.sharding import PartitionSpec as P
from mdhs_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
mesh = make_mesh(n_model=2)
assert dict(mesh.shape) == {"data": 4, "model": 2}, mesh.shape
batch = {"x": np.zeros((8, 4), np.float32)}
sb = shard_batch(batch, mesh)
assert sb["x"].sharding.spec == P("data"), sb["x"].sharding
params = {"layer": {"intermediate": {"kernel": np.zeros((4, 8), np.float32)}},
          "classifier": {"experts": {"w": np.zeros((2, 3, 3), np.float32)}},
          "other": {"bias": np.zeros((4,), np.float32)}}
sp = shard_params(params, mesh)
assert sp["layer"]["intermediate"]["kernel"].sharding.spec == P(None, "model")
assert sp["classifier"]["experts"]["w"].sharding.spec == P("model", None, None)
print("OKMESH")
"""
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=_clean_env(),
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OKMESH" in out.stdout
