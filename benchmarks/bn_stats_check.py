"""bn_stats on the real chip: Mosaic compile + numeric check + speed vs the
XLA two-pass reference at ResNet50 batch-128 shapes. Run before flipping
ops.bn_stats.ENABLED."""
import time
import jax, jax.numpy as jnp, numpy as np
import mdhs_tpu.ops.bn_stats as bns

print("backend:", jax.default_backend())
K, N = 8, 3
shapes = [(128, 112, 112, 64), (128, 56, 56, 256), (128, 28, 28, 512),
          (128, 14, 14, 1024), (128, 7, 7, 2048)]
for shape in shapes:
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.normal(size=shape) * 2 + 3).astype(np.float32)).astype(jnp.bfloat16)
    assert bns.supports(shape, jnp.bfloat16), shape
    m, v = jax.jit(bns.bn_stats)(x)
    mr, vr = jax.jit(bns.bn_stats_reference)(x)
    dm = float(jnp.abs(m - mr).max()); dv = float(jnp.abs(v - vr).max())

    def chain(fn):
        @jax.jit
        def run(x):
            def body(c, t):
                m, v = fn(x + jnp.asarray(t, x.dtype) * 0)
                return c + m.sum() + v.sum(), None
            return jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(K))[0]
        run(x).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(N):
            run(x).block_until_ready()
        return (time.perf_counter() - t0) / (N * K) * 1000

    tk = chain(bns.bn_stats)
    tr = chain(bns.bn_stats_reference)
    print(f"{shape}: dmean={dm:.2e} dvar={dv:.2e} kernel={tk:.3f}ms xla={tr:.3f}ms "
          f"speedup={tr/tk:.2f}x")
