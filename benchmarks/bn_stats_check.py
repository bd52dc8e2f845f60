"""bn_stats on the real chip: Mosaic compile + numeric check + speed vs the
XLA two-pass reference at ResNet50 batch-128 shapes. Run before flipping
ops.bn_stats.ENABLED."""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

import mdhs_tpu.ops.bn_stats as bns

sys.path.insert(0, str(Path(__file__).resolve().parent))
from kernels_bench import timed_chain  # one canonical LICM-proof harness

print("backend:", jax.default_backend())
shapes = [(128, 112, 112, 64), (128, 56, 56, 256), (128, 28, 28, 512),
          (128, 14, 14, 1024), (128, 7, 7, 2048)]
for shape in shapes:
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.normal(size=shape) * 2 + 3).astype(np.float32)).astype(jnp.bfloat16)
    assert bns.supports(shape, jnp.bfloat16), shape
    m, v = jax.jit(bns.bn_stats)(x)
    mr, vr = jax.jit(bns.bn_stats_reference)(x)
    dm = float(jnp.abs(m - mr).max())
    dv = float(jnp.abs(v - vr).max())

    tk = timed_chain(lambda x: jnp.concatenate(bns.bn_stats(x)), x)
    tr = timed_chain(lambda x: jnp.concatenate(bns.bn_stats_reference(x)), x)
    print(f"{shape}: dmean={dm:.2e} dvar={dv:.2e} kernel={tk:.3f}ms xla={tr:.3f}ms "
          f"speedup={tr/tk:.2f}x")
