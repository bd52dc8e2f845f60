"""Selective-scan kernel: Pallas path vs associative-scan reference vs brute
force, plus gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdhs_tpu.ops.selective_scan import (
    _selective_scan_tpu,
    selective_scan,
    selective_scan_ref,
)


def make_inputs(B=2, L=12, D=8, N=4, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    x = jax.random.normal(ks[0], (B, L, D))
    dt = jax.nn.softplus(jax.random.normal(ks[1], (B, L, D)))
    A = -jnp.exp(jax.random.normal(ks[2], (D, N)))
    Bm = jax.random.normal(ks[3], (B, L, N))
    Cm = jax.random.normal(ks[4], (B, L, N))
    Ds = jax.random.normal(ks[5], (D,))
    return x, dt, A, Bm, Cm, Ds


def brute_force(x, dt, A, Bm, Cm, Ds):
    x, dt, A, Bm, Cm, Ds = map(np.asarray, (x, dt, A, Bm, Cm, Ds))
    B, L, D = x.shape
    N = A.shape[1]
    h = np.zeros((B, D, N))
    ys = []
    for t in range(L):
        h = np.exp(dt[:, t, :, None] * A[None]) * h + (
            (dt[:, t] * x[:, t])[:, :, None] * Bm[:, t][:, None, :]
        )
        ys.append((h * Cm[:, t][:, None, :]).sum(-1) + Ds[None] * x[:, t])
    return np.stack(ys, 1)


def test_ref_matches_brute_force():
    inputs = make_inputs()
    y = np.asarray(selective_scan_ref(*inputs))
    np.testing.assert_allclose(y, brute_force(*inputs), atol=1e-4, rtol=1e-4)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="pallas TPU kernel")
def test_pallas_matches_ref_on_tpu():
    # D > 128 exercises multiple channel blocks; D=72 exercises padding.
    for D in (72, 256):
        inputs = make_inputs(B=2, L=16, D=D, N=8)
        y_ref = np.asarray(selective_scan_ref(*inputs))
        y_pl = np.asarray(jax.jit(_selective_scan_tpu)(*inputs))
        np.testing.assert_allclose(y_pl, y_ref, atol=2e-3, rtol=2e-3)


def test_gradients_flow():
    inputs = make_inputs(B=1, L=6, D=4, N=3)

    def loss(*args):
        return (selective_scan(*args) ** 2).sum()

    grads = jax.grad(loss, argnums=tuple(range(6)))(*inputs)
    for g, x in zip(grads, inputs):
        assert g.shape == x.shape
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0
