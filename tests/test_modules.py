"""Shape + numeric unit tests for the module zoo (SURVEY.md §4 strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdhs_tpu.modules.fusion import build_fusion
from mdhs_tpu.modules.gating import DualExpertGate
from mdhs_tpu.modules.heads import build_head
from mdhs_tpu.modules.kan import KAN, GroupKANLinear, b_splines, make_grid
from mdhs_tpu.modules.mamba import MambaBlock
from mdhs_tpu.modules.moe import MoE, cv_squared
from mdhs_tpu.modules.sequence import SequenceEncoder
from mdhs_tpu.modules.tabular import TabularEncoder

KEY = jax.random.PRNGKey(0)
F32 = jnp.float32


def jinit(module, *args, rngs=None, **kwargs):
    init = jax.jit(lambda r, *a: module.init(rngs or r, *a, **kwargs))
    return init(KEY, *args)


ALL_FUSIONS = [
    "basic",
    "multiscale",
    "concat",
    "weighted_concat",
    "hadamard",
    "bilinear",
    "mamba",
    "vmamba",
]


@pytest.mark.parametrize("fusion_type", ALL_FUSIONS)
def test_fusion_shapes(fusion_type):
    img = jax.random.normal(KEY, (2, 49, 16))
    txt = jax.random.normal(KEY, (2, 12, 24))
    mask = jnp.ones((2, 12), jnp.int32)
    if fusion_type == "multiscale":
        img = {k: img for k in ("layer2", "layer3", "layer4")}
    fu = build_fusion(fusion_type, text_dim=24, hidden_dim=16, dtype=F32)
    v = jinit(fu, img, txt, mask)
    out = jax.jit(fu.apply)(v, img, txt, mask)
    assert out.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_fusion_mask_matters():
    """Padding tokens must not influence cross-attention output."""
    img = jax.random.normal(KEY, (2, 8, 16))
    txt = jax.random.normal(KEY, (2, 6, 24))
    mask = jnp.array([[1, 1, 1, 0, 0, 0]] * 2, jnp.int32)
    fu = build_fusion("basic", text_dim=24, hidden_dim=16, dtype=F32)
    v = jinit(fu, img, txt, mask)
    out1 = jax.jit(fu.apply)(v, img, txt, mask)
    txt2 = txt.at[:, 3:].set(99.0)  # change only masked positions
    out2 = jax.jit(fu.apply)(v, img, txt2, mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


@pytest.mark.parametrize("head", ["mlp", "residual", "attention_pooling", "kan"])
def test_head_shapes(head):
    x = jax.random.normal(KEY, (3, 16))
    h = build_head(head, hidden_dim=16, num_classes=7, kan_num_groups=4, dtype=F32)
    v = jinit(h, x)
    out = jax.jit(h.apply)(v, x)
    assert out.shape == (3, 7)
    assert out.dtype == jnp.float32


def test_gate():
    g = DualExpertGate(hidden_dim=8, use_entropy=True, dtype=F32)
    a = jax.random.normal(KEY, (4, 16))
    b = jax.random.normal(KEY, (4, 16))
    e = jnp.ones((4, 1))
    v = jinit(g, a, b, e)
    alpha = jax.jit(g.apply)(v, a, b, e)
    assert alpha.shape == (4, 1)
    assert (np.asarray(alpha) > 0).all() and (np.asarray(alpha) < 1).all()


@pytest.mark.parametrize("kind", ["lstm", "gru", "transformer"])
def test_sequence_encoder(kind):
    se = SequenceEncoder(input_dim=16, hidden_dim=8, encoder_type=kind, dtype=F32)
    x = jax.random.normal(KEY, (2, 5, 16))
    v = jinit(se, x)
    out = jax.jit(se.apply)(v, x)
    assert out.shape == (2, 8)


def test_tabular():
    t = TabularEncoder(hidden_dim=8, dtype=F32)
    x = jax.random.normal(KEY, (4, 11))
    v = jinit(t, x)
    assert jax.jit(t.apply)(v, x).shape == (4, 8)


def test_bspline_partition_of_unity():
    """Cox-de Boor bases must sum to 1 inside the grid interior."""
    grid = make_grid(4, 5, 3)
    x = jnp.linspace(-0.9, 0.9, 7)[:, None] * jnp.ones((1, 4))
    bases = b_splines(x, grid, 3)
    np.testing.assert_allclose(np.asarray(bases.sum(-1)), 1.0, atol=1e-5)


def test_kan_forward():
    k = KAN(layers_hidden=(16, 8, 4), dtype=F32)
    x = jax.random.normal(KEY, (5, 16))
    v = jinit(k, x)
    out = jax.jit(k.apply)(v, x)
    assert out.shape == (5, 4)
    # 4-D style input: flattened leading dims
    x4 = jax.random.normal(KEY, (2, 3, 16))
    assert jax.jit(k.apply)(v, x4).shape == (2, 3, 4)


def test_groupkan_groups_divide():
    with pytest.raises(ValueError):
        g = GroupKANLinear(15, 4, num_groups=4, dtype=F32)
        jinit(g, jnp.zeros((2, 15)))


def test_moe_gates_and_balance():
    moe = MoE(input_size=16, output_size=6, num_experts=4, k=2,
              expert_layers=(16, 8, 6), dtype=F32)
    x = jax.random.normal(KEY, (8, 16))
    v = jax.jit(lambda r, x: moe.init({"params": r, "gating": r}, x, train=True))(KEY, x)
    y, bl = jax.jit(lambda v, x: moe.apply(v, x, train=True, rngs={"gating": KEY}))(v, x)
    assert y.shape == (8, 6)
    assert float(bl) >= 0
    y2, _ = jax.jit(lambda v, x: moe.apply(v, x, train=False))(v, x)
    assert y2.shape == (8, 6)


def test_cv_squared():
    assert float(cv_squared(jnp.array([1.0, 1.0, 1.0]))) < 1e-6
    assert float(cv_squared(jnp.array([1.0]))) == 0.0
    assert float(cv_squared(jnp.array([0.0, 10.0]))) > 1.0


def test_mamba_block_causality():
    m = MambaBlock(d_model=32, dtype=F32)
    x = jax.random.normal(KEY, (1, 10, 32))
    v = jinit(m, x)
    y1 = jax.jit(m.apply)(v, x)
    # Perturb the future: outputs at t<5 must not change (causal scan+conv).
    x2 = x.at[:, 7:, :].add(13.0)
    y2 = jax.jit(m.apply)(v, x2)
    np.testing.assert_allclose(np.asarray(y1[:, :4]), np.asarray(y2[:, :4]), atol=1e-4)
    assert np.abs(np.asarray(y1[:, 8:]) - np.asarray(y2[:, 8:])).max() > 1e-3


def test_hierarchical_fusion():
    """ResNet l2/l3/l4 x BERT hidden 4/8/12 adaptive-weighted fusion."""
    img = {k: jax.random.normal(KEY, (2, 8, 16)) for k in ("layer2", "layer3", "layer4")}
    txt = jax.random.normal(KEY, (2, 6, 24))
    hidden = tuple(jax.random.normal(jax.random.PRNGKey(i), (2, 6, 24)) for i in range(13))
    mask = jnp.ones((2, 6), jnp.int32)
    fu = build_fusion("hierarchical", text_dim=24, hidden_dim=16, dtype=F32)
    v = jax.jit(lambda r: fu.init(r, img, txt, mask, text_hidden_states=hidden))(KEY)
    out = jax.jit(lambda v: fu.apply(v, img, txt, mask, text_hidden_states=hidden))(v)
    assert out.shape == (2, 16)
    # different hidden states must change the output (layers actually used)
    hidden2 = tuple(h + 1.0 for h in hidden)
    out2 = jax.jit(lambda v: fu.apply(v, img, txt, mask, text_hidden_states=hidden2))(v)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-4


def test_sinusoidal_pe_matches_torch_formula():
    """Differential vs the reference PE (sequence_blocks.py:47-56,
    len4mamba.py:122-129): pe[:, 0::2] = sin(pos*div), pe[:, 1::2] =
    cos(pos*div). A precedence bug here once made every cosine channel
    position-independent — pin the exact values."""
    import torch

    from mdhs_tpu.modules.sequence import sinusoidal_pe

    for T, dim in [(5, 8), (16, 256), (7, 6)]:
        position = torch.arange(T).unsqueeze(1).float()
        div_term = torch.exp(
            torch.arange(0, dim, 2).float() * (-np.log(10000.0) / dim)
        )
        ref = torch.zeros(T, dim)
        ref[:, 0::2] = torch.sin(position * div_term)
        ref[:, 1::2] = torch.cos(position * div_term[: dim // 2])
        got = np.asarray(sinusoidal_pe(T, dim))
        np.testing.assert_allclose(got, ref.numpy(), atol=1e-6, err_msg=f"{T}x{dim}")
        # the highest-frequency cosine channel must vary with position (the
        # precedence bug made every cos channel constant; the lowest-frequency
        # channels legitimately vary below f32 resolution at tiny T)
        assert np.abs(np.diff(got[:, 1])).max() > 1e-3
