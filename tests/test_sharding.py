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
