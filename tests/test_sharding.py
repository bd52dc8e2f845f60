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
    # opt_state must inherit the TP/EP placements (Adam moments are
    # param-shaped) — a propagation regression would silently replicate them
    opt_specs = [str(getattr(l.sharding, "spec", l.sharding))
                 for l in jax.tree_util.tree_leaves(tr.state.opt_state)
                 if hasattr(l, "sharding") and l.ndim >= 2]
    assert any(MODEL_AXIS in s for s in opt_specs), set(opt_specs)
    batch = next(iter(tr.train_loader))
    jb = tr._device_batch(batch)
    assert jb["image"].sharding.spec == P(DATA_AXIS)
    state = tr.fit()
    assert int(state.step) == len(tr.train_loader)
    # per-class epoch report runs the same sharded path as validate()
    rep = tr.log_validation_report(tr.eval_step_fn(), epoch=1)
    assert rep is not None and math.isfinite(float(rep["f1_macro"]))
    print("OK-BASELINE-FIT")

    # sharded checkpoint roundtrip: save_last wrote host arrays; a fresh
    # Trainer on the same mesh must restore them onto sharded devices and
    # resume training
    last = os.path.join(tmp, "run", "last.msgpack")
    assert os.path.exists(last)
    cd_r = dict(cd)
    cd_r["training"] = dict(cd["training"], resume_from=last)
    tr_r = Trainer(Config(cd_r), family="baseline",
                   output_dir=os.path.join(tmp, "run_resume"))
    a = jax.tree_util.tree_leaves(tr.state.params)[0]
    b = jax.tree_util.tree_leaves(tr_r.state.params)[0]
    import numpy as _np
    _np.testing.assert_allclose(_np.asarray(a), _np.asarray(b), atol=1e-7)
    leaves_r = jax.tree_util.tree_leaves_with_path(tr_r.state.params)
    assert any(MODEL_AXIS in str(l.sharding.spec) for _, l in leaves_r)
    step_r = tr_r.train_step_fn()
    jb_r = tr_r._device_batch(next(iter(tr_r.train_loader)))
    tr_r.state, m_r = step_r(tr_r.state, jb_r, tr_r.rng)
    assert math.isfinite(float(m_r["loss"]))
    print("OK-RESUME-ROUNDTRIP")

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
    assert "OK-RESUME-ROUNDTRIP" in out.stdout
    assert "OK-MIBF-STEP" in out.stdout


def test_sequence_parallel_8cpu():
    """Sequence parallelism (parallel.sequence_parallel): the BERT residual
    stream is sharded P(data, model, None) between layers (bert.py
    sp_mesh_shape). Checks (a) the constraint actually lands (output hidden
    states arrive seq-sharded over the model axis), (b) numerics are
    IDENTICAL to the unsharded path (sp only re-places work; GSPMD inserts
    the all-gather/reduce-scatter pairs), (c) the Trainer knob wires it and
    a train step's loss matches the sp-off run bit-for-bit in f32."""
    code = """
import dataclasses, math, os, tempfile
import jax, numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from mdhs_tpu.models.bert import BertConfig, BertModel
from mdhs_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

devs = np.array(jax.devices()).reshape(2, 4)
mesh = Mesh(devs, (DATA_AXIS, MODEL_AXIS))
base = BertConfig.tiny()
sp_cfg = dataclasses.replace(base, sp_mesh_shape=((DATA_AXIS, 2), (MODEL_AXIS, 4)))
B, L = 4, 16
ids = jnp.asarray(np.random.default_rng(0).integers(0, 500, (B, L), np.int32))
mask = jnp.ones((B, L), jnp.int32)
model = BertModel(base, dtype=jnp.float32)
model_sp = BertModel(sp_cfg, dtype=jnp.float32)
params = jax.jit(lambda r: model.init({"params": r}, ids, mask))(jax.random.PRNGKey(0))
ids_s = jax.device_put(ids, NamedSharding(mesh, P(DATA_AXIS)))
mask_s = jax.device_put(mask, NamedSharding(mesh, P(DATA_AXIS)))
ref, _ = jax.jit(lambda p, i, m: model.apply(p, i, m))(params, ids, mask)
out, _ = jax.jit(lambda p, i, m: model_sp.apply(p, i, m))(params, ids_s, mask_s)
assert MODEL_AXIS in str(out.sharding.spec), out.sharding
np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6, rtol=1e-6)
print("OK-SP-BERT")

# Trainer knob: same seed/batches, sp on vs off, f32 -> identical loss.
from mdhs_tpu.core.config import Config
from mdhs_tpu.data.synthetic import generate_synthetic_dataset, synthetic_config
from mdhs_tpu.train.trainer import Trainer

with tempfile.TemporaryDirectory() as tmp:
    paths = generate_synthetic_dataset(tmp, num_images=8, image_size=48)
    losses = {}
    for sp_on in (False, True):
        cd = synthetic_config(paths, tmp, batch_size=8, num_epochs=1, max_length=16)
        cd["data"]["canvas"] = 56
        cd["data"]["image_size"] = 48
        cd["training"]["precision"] = "f32"
        cd["parallel"] = {"n_model": 2, "sequence_parallel": sp_on}
        tr = Trainer(Config(cd), family="baseline",
                     output_dir=os.path.join(tmp, f"run{sp_on}"))
        assert bool(tr.model.cfg.bert.sp_mesh_shape) == sp_on
        step = tr.train_step_fn()
        jb = tr._device_batch(next(iter(tr.train_loader)))
        tr.state, m = step(tr.state, jb, tr.rng)
        losses[sp_on] = float(m["loss"])
    assert math.isfinite(losses[True])
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-6)
    print("OK-SP-TRAINER")
"""
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=_clean_env(),
        capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "OK-SP-BERT" in out.stdout
    assert "OK-SP-TRAINER" in out.stdout


def test_pipeline_parallel_8cpu():
    """GPipe pipeline over the model axis (parallel/pipeline.py): BERT
    layer blocks live on their stage's device only, microbatches hop via
    ppermute. Forward AND gradients must match the serial BertModel
    bit-near (f32): the backward is the scan/ppermute transpose, so this
    exercises the full reverse pipeline."""
    code = open(os.path.join(REPO, "tests", "data", "pp_parity_check.py")).read()
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=_clean_env(),
        capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "OK-PP-FWD" in out.stdout
    assert "OK-PP-GRAD" in out.stdout


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


def test_two_process_distributed(tmp_path):
    """2-process jax.distributed: torchrun-style envs -> initialize_multihost
    -> 8 global devices (2 hosts x 4 virtual CPUs) -> real Trainer mesh ->
    one sharded train step per process -> identical finite losses.

    This is the actual multi-process DDP surface the reference exposes
    (mibf_net/train_resnet.py:84-88); collectives cross the process
    boundary through the distributed runtime.
    """
    import socket

    from mdhs_tpu.data.synthetic import generate_synthetic_dataset

    def free_port():
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            return s.getsockname()[1]

    data_dir = str(tmp_path / "data")
    paths = generate_synthetic_dataset(data_dir, num_images=16, image_size=48)
    import json

    with open(os.path.join(data_dir, "paths.json"), "w") as f:
        json.dump({k: v for k, v in paths.items() if v}, f)

    code = """
import json, math, os, sys, tempfile
from mdhs_tpu.parallel.distributed import initialize_multihost
assert initialize_multihost(), "env vars not picked up"
import jax
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

# Establish the Gloo pairs with a trivial barrier BEFORE any heavy compile:
# pair connects happen lazily at the FIRST collective, so if one rank is
# still inside a minutes-long trainer compile when the other reaches its
# first psum, the peer's 30s connect timeout fails the whole run. Here both
# ranks are milliseconds apart; the established pairs are reused afterwards.
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("pair-warmup")

from mdhs_tpu.core.config import Config
from mdhs_tpu.data.synthetic import synthetic_config
from mdhs_tpu.train.trainer import Trainer

data_dir = sys.argv[1]
with open(os.path.join(data_dir, "paths.json")) as f:
    paths = json.load(f)
with tempfile.TemporaryDirectory() as run:
    cd = synthetic_config(paths, run, batch_size=8, num_epochs=1, max_length=16)
    # mixed {data:4, model:2} mesh over 2 processes x 4 devices: DP grad
    # psums cross the process boundary while TP all-gathers stay host-local
    # (the production multi-host layout, mesh.py reshape order)
    cd["parallel"] = {"n_model": 2}
    cd["data"]["canvas"] = 56
    cd["data"]["image_size"] = 48
    tr = Trainer(Config(cd), family="baseline",
                 output_dir=os.path.join(run, f"r{jax.process_index()}"))
    assert tr.mesh.size == 8, tr.mesh.shape
    step = tr.train_step_fn()
    jb = tr._device_batch(next(iter(tr.train_loader)))
    tr.state, m = step(tr.state, jb, tr.rng)
    loss = float(m["loss"])
    assert math.isfinite(loss), loss
    print("LOSS=%.9f" % loss)
"""
    def launch(port, attempt):
        procs = []
        logs = []
        for rank in range(2):
            env = _clean_env()
            env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
            env.update(
                MASTER_ADDR="127.0.0.1", MASTER_PORT=str(port),
                WORLD_SIZE="2", RANK=str(rank),
            )
            logf = open(str(tmp_path / f"rank{rank}_a{attempt}.log"), "w+")
            logs.append(logf)
            procs.append(subprocess.Popen(
                [sys.executable, "-c", code, data_dir], cwd=REPO, env=env,
                stdout=logf, stderr=subprocess.STDOUT,
            ))
        rcs = [p.wait(timeout=900) for p in procs]
        outs = []
        for logf in logs:
            logf.seek(0)
            outs.append(logf.read())
            logf.close()
        return rcs, outs

    # free_port() -> use is a TOCTOU race; retry with a fresh port if the
    # coordinator failed to bind (another process grabbed it in between)
    for attempt in range(3):
        rcs, outs = launch(free_port(), attempt)
        if rcs == [0, 0]:
            break
        transient = any(
            s in o for o in outs
            for s in (
                "Address already in use", "Failed to bind", "UNAVAILABLE",
                # Gloo pairs connect at the first collective; on a loaded
                # single-core host one rank can still be inside its XLA
                # compile when the peer's connect timeout (30s) expires
                "Gloo context initialization failed",
                "Connect timeout",
            )
        )
        if not transient:
            break
    assert rcs == [0, 0], f"rcs={rcs}\n--- rank0:\n{outs[0][-3000:]}\n--- rank1:\n{outs[1][-3000:]}"
    losses = []
    for o in outs:
        line = [l for l in o.splitlines() if l.startswith("LOSS=")]
        assert line, o[-2000:]
        losses.append(float(line[-1].split("=")[1]))
    assert losses[0] == losses[1], losses


def test_data_axis_size():
    """Mesh sizing: largest divisor <= available, not gcd (which can
    undershoot), with graceful degradation to 1."""
    from mdhs_tpu.parallel.mesh import data_axis_size

    assert data_axis_size(6, 4) == 3       # gcd(6,4)=2 would waste a device
    assert data_axis_size(8, 8) == 8
    assert data_axis_size(8, 5) == 4
    assert data_axis_size(7, 4) == 1       # prime batch: single device
    assert data_axis_size(128, 8) == 8
    assert data_axis_size(4, 8) == 4       # batch smaller than devices
    assert data_axis_size(1, 8) == 1


def test_initialize_multihost_process_id_autodetect(monkeypatch):
    """COORDINATOR_ADDRESS + NUM_PROCESSES without PROCESS_ID must pass
    process_id=None (JAX cluster auto-detection) — int(pid or 0) would make
    every host claim process 0 and hang the coordinator barrier."""
    import jax

    from mdhs_tpu.parallel.distributed import initialize_multihost

    calls = {}

    def fake_init(**kw):
        calls.update(kw)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    for var in ("MASTER_ADDR", "MASTER_PORT", "WORLD_SIZE", "RANK"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setenv("COORDINATOR_ADDRESS", "127.0.0.1:9999")
    monkeypatch.setenv("NUM_PROCESSES", "2")
    monkeypatch.delenv("PROCESS_ID", raising=False)
    assert initialize_multihost()
    assert calls["num_processes"] == 2
    assert calls["process_id"] is None

    calls.clear()
    monkeypatch.setenv("PROCESS_ID", "1")
    assert initialize_multihost()
    assert calls["process_id"] == 1
