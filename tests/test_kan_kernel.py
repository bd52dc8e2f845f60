"""Fused KAN forward kernel vs jnp reference, incl. the Pallas TPU path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdhs_tpu.ops.kan_spline import _kan_forward_pallas, kan_forward, kan_forward_ref


def make_inputs(B=64, IN=96, OUT=40, G=5, K=3, seed=0):
    from mdhs_tpu.modules.kan import make_grid

    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(ks[0], (B, IN)) * 0.7
    grid = make_grid(IN, G, K)
    bw = jax.random.normal(ks[1], (OUT, IN)) * 0.1
    sw = jax.random.normal(ks[2], (OUT, IN, G + K)) * 0.1
    return x, grid, bw, sw, K


def test_ref_matches_module_math():
    from mdhs_tpu.modules.kan import b_splines

    x, grid, bw, sw, K = make_inputs()
    y = np.asarray(kan_forward_ref(x, grid, bw, sw, K))
    base = np.asarray(jax.nn.silu(x) @ bw.T)
    bases = np.asarray(b_splines(x, grid, K))
    spline = bases.reshape(x.shape[0], -1) @ np.asarray(sw).reshape(sw.shape[0], -1).T
    np.testing.assert_allclose(y, base + spline, atol=1e-5)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="pallas TPU kernel")
def test_pallas_matches_ref_on_tpu():
    # non-multiples of 128 exercise padding on both batch and out axes
    x, grid, bw, sw, K = make_inputs(B=200, IN=96, OUT=72)
    y_ref = np.asarray(kan_forward_ref(x, grid, bw, sw, K))
    y_pl = np.asarray(jax.jit(lambda *a: _kan_forward_pallas(*a, K))(x, grid, bw, sw))
    np.testing.assert_allclose(y_pl, y_ref, atol=2e-3, rtol=2e-3)


def test_gradients():
    x, grid, bw, sw, K = make_inputs(B=16, IN=8, OUT=4)

    def loss(x, bw, sw):
        return (kan_forward(x, grid, bw, sw, K) ** 2).sum()

    gx, gbw, gsw = jax.grad(loss, argnums=(0, 1, 2))(x, bw, sw)
    for g in (gx, gbw, gsw):
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0
