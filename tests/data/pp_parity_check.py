"""Pipeline-parallel parity check, run by test_sharding.py in a clean
8-virtual-CPU-device subprocess (and adaptable by users as the
parallel.pipeline usage example): BertModel forward and gradients through
pipeline_bert must match the serial model."""
import dataclasses
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mdhs_tpu.models.bert import BertConfig, BertModel
from mdhs_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from mdhs_tpu.parallel.pipeline import pipeline_bert

devs = np.array(jax.devices()).reshape(2, 4)
mesh = Mesh(devs, (DATA_AXIS, MODEL_AXIS))

cfg = dataclasses.replace(BertConfig.tiny(), num_hidden_layers=4)
B, L = 8, 16
rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, 500, (B, L), np.int32))
mask = jnp.asarray((rng.random((B, L)) > 0.2).astype(np.int32))
mask = mask.at[:, 0].set(1)

model = BertModel(cfg, dtype=jnp.float32)
params = jax.jit(lambda r: model.init({"params": r}, ids, mask))(jax.random.PRNGKey(0))

ref, _ = jax.jit(lambda p, i, m: model.apply(p, i, m))(params, ids, mask)

pp = jax.jit(lambda p, i, m: pipeline_bert(
    p, cfg, i, m, mesh=mesh, n_microbatches=4, dtype=jnp.float32))
out = pp(params, ids, mask)
print("pp out sharding:", out.sharding.spec)
np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6, rtol=1e-6)
print("OK-PP-FWD")

# gradient parity: d(loss)/d(params) through the pipeline == serial
def loss_pp(p):
    return jnp.sum(pp(p, ids, mask) ** 2)

def loss_ref(p):
    h, _ = model.apply(p, ids, mask)
    return jnp.sum(h ** 2)

g_pp = jax.jit(jax.grad(loss_pp))(params)
g_ref = jax.jit(jax.grad(loss_ref))(params)
for (kp, a), (_, b) in zip(
    jax.tree_util.tree_leaves_with_path(g_pp),
    jax.tree_util.tree_leaves_with_path(g_ref),
):
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-5,
        err_msg=jax.tree_util.keystr(kp),
    )
print("OK-PP-GRAD")
