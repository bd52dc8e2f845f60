"""Tests for ops/fused_attention.py and ops/gelu.py (exact-mode fast paths).

The fused attention kernel and the poly-tanh erf-GELU are the default
bf16 eval paths (BertConfig.attention_impl="auto"), so their numerics
must match the exact XLA implementations to bf16 rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdhs_tpu.ops.fused_attention import attention_reference, fused_attention, supports
from mdhs_tpu.ops.gelu import exact_gelu, gelu_exact_fast

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="Mosaic kernel lowering needs the TPU backend (no interpret fallback here)",
)

B, L, H, D = 4, 128, 12, 64
HD = H * D
SCALE = float(D) ** -0.5


def _qkvb(seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, L, HD)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, L, HD)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, L, HD)), jnp.bfloat16)
    mask = np.ones((B, L), np.float32)
    mask[:, 100:] = 0.0
    bias = jnp.asarray((1.0 - mask) * -1e9, jnp.float32)
    return q, k, v, bias


@requires_tpu
@pytest.mark.parametrize("seq_len", [128, 256, 512])
def test_fused_attention_matches_reference(seq_len):
    # 512 exercises the head-grouped scratch path (whole-heads scratch
    # would blow the VMEM budget); ConNexT tokenizes at 512.
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, seq_len, HD)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((2, seq_len, HD)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((2, seq_len, HD)), jnp.bfloat16)
    mask = np.ones((2, seq_len), np.float32)
    mask[:, seq_len - 28 :] = 0.0
    bias = jnp.asarray((1.0 - mask) * -1e9, jnp.float32)
    ref = attention_reference(q, k, v, bias, H, SCALE).astype(jnp.float32)
    out = jax.jit(lambda *a: fused_attention(*a, H, SCALE))(q, k, v, bias).astype(jnp.float32)
    # identical math modulo reassociation: a couple of bf16 ulps at |x|~1
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-2, rtol=0)
    # agreement should be tight on average, not just within the atol bound
    assert float(jnp.abs(out - ref).mean()) < 2e-3


@requires_tpu
def test_fused_attention_grad_works():
    q, k, v, bias = _qkvb(1)

    def loss(q):
        return fused_attention(q, k, v, bias, H, SCALE).astype(jnp.float32).sum()

    def loss_ref(q):
        return attention_reference(q, k, v, bias, H, SCALE).astype(jnp.float32).sum()

    g = jax.jit(jax.grad(loss))(q).astype(jnp.float32)
    g_ref = jax.jit(jax.grad(loss_ref))(q).astype(jnp.float32)
    # backward is literally the reference VJP — must agree to bf16 rounding
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=3e-2, rtol=0)


def test_supports_gate():
    assert supports(jnp.bfloat16, 128, 768, 12)
    assert supports(jnp.bfloat16, 512, 768, 12)
    assert not supports(jnp.float32, 128, 768, 12)  # f32 parity path -> XLA
    assert not supports(jnp.bfloat16, 100, 768, 12)  # unaligned seq
    assert not supports(jnp.bfloat16, 1024, 768, 12)  # too long for VMEM plan
    assert not supports(jnp.bfloat16, 128, 64, 4)  # tiny test config -> XLA


def test_bert_auto_impl_matches_xla():
    from mdhs_tpu.models.bert import BertConfig, BertModel

    ids = jnp.asarray(np.random.default_rng(0).integers(0, 30000, (B, L), np.int32))
    mask = np.ones((B, L), np.int32)
    mask[:, 100:] = 0
    mask = jnp.asarray(mask)

    m_x = BertModel(BertConfig(attention_impl="xla"), dtype=jnp.bfloat16)
    var = jax.jit(lambda: m_x.init(jax.random.PRNGKey(0), ids[:2], mask[:2]))()
    out_x = jax.jit(lambda v, i, am: m_x.apply(v, i, am)[0])(var, ids, mask)

    m_a = BertModel(BertConfig(attention_impl="auto"), dtype=jnp.bfloat16)
    out_a = jax.jit(lambda v, i, am: m_a.apply(v, i, am)[0])(var, ids, mask)

    # 12 layers of accumulated bf16-rounding-level differences
    np.testing.assert_allclose(
        np.asarray(out_a.astype(jnp.float32)),
        np.asarray(out_x.astype(jnp.float32)),
        atol=0.15,
        rtol=0,
    )
    d = jnp.abs(out_a.astype(jnp.float32) - out_x.astype(jnp.float32))
    assert float(d.mean()) < 0.01


@requires_tpu
def test_attention_block_matches_reference():
    from mdhs_tpu.ops.attention_block import attention_block, attention_block_reference

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, L, HD)), jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((HD, 3 * HD)) * 0.03, jnp.bfloat16)
    bqkv = jnp.asarray(rng.standard_normal(3 * HD) * 0.01, jnp.bfloat16)
    wo = jnp.asarray(rng.standard_normal((HD, HD)) * 0.03, jnp.bfloat16)
    bo = jnp.asarray(rng.standard_normal(HD) * 0.01, jnp.bfloat16)
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(HD), jnp.bfloat16)
    beta = jnp.asarray(0.1 * rng.standard_normal(HD), jnp.bfloat16)
    mask = np.ones((4, L), np.float32)
    mask[:, 100:] = 0.0
    bias = jnp.asarray((1.0 - mask) * -1e9, jnp.float32)
    args = (x, wqkv, bqkv, wo, bo, gamma, beta, bias)
    ref = attention_block_reference(*args, H, SCALE, 1e-12).astype(jnp.float32)
    out = jax.jit(lambda *a: attention_block(*a, H, SCALE, 1e-12))(*args).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=6e-2, rtol=0)
    assert float(jnp.abs(out - ref).mean()) < 5e-3

    def loss(x):
        return attention_block(x, *args[1:], H, SCALE, 1e-12).astype(jnp.float32).sum()

    g = jax.jit(jax.grad(loss))(x)
    assert bool(jnp.isfinite(g.astype(jnp.float32)).all())


@requires_tpu
def test_ffn_block_matches_reference():
    from mdhs_tpu.ops.ffn_block import ffn_block, ffn_block_reference, supports

    assert supports(jnp.bfloat16, 2048, 768, 3072)
    assert not supports(jnp.bfloat16, 128, 768, 3072)  # batch-1 predict -> XLA
    rng = np.random.default_rng(0)
    N, Hd, Di = 1024, 768, 3072
    x = jnp.asarray(rng.standard_normal((N, Hd)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((Hd, Di)) * 0.03, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal(Di) * 0.01, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((Di, Hd)) * 0.03, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal(Hd) * 0.01, jnp.bfloat16)
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(Hd), jnp.bfloat16)
    beta = jnp.asarray(0.1 * rng.standard_normal(Hd), jnp.bfloat16)
    args = (x, w1, b1, w2, b2, gamma, beta)
    ref = ffn_block_reference(*args, 1e-12).astype(jnp.float32)
    out = jax.jit(lambda *a: ffn_block(*a, 1e-12))(*args).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=6e-2, rtol=0)
    assert float(jnp.abs(out - ref).mean()) < 5e-3

    def loss(x):
        return ffn_block(x, *args[1:], 1e-12).astype(jnp.float32).sum()

    g = jax.jit(jax.grad(loss))(x)
    assert bool(jnp.isfinite(g.astype(jnp.float32)).all())


def test_bert_auto_impl_matches_xla_seq512():
    # ConNexT tokenization length: attention block is VMEM-gated off here,
    # but the standalone fused attention and the FFN block still engage.
    from mdhs_tpu.models.bert import BertConfig, BertModel

    Lx = 512
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 30000, (2, Lx), np.int32))
    mask = np.ones((2, Lx), np.int32)
    mask[:, 480:] = 0
    mask = jnp.asarray(mask)
    m_x = BertModel(BertConfig(attention_impl="xla"), dtype=jnp.bfloat16)
    var = jax.jit(lambda: m_x.init(jax.random.PRNGKey(0), ids, mask))()
    out_x = jax.jit(lambda v, i, am: m_x.apply(v, i, am)[0])(var, ids, mask)
    m_a = BertModel(BertConfig(attention_impl="auto"), dtype=jnp.bfloat16)
    out_a = jax.jit(lambda v, i, am: m_a.apply(v, i, am)[0])(var, ids, mask)
    d = jnp.abs(out_a.astype(jnp.float32) - out_x.astype(jnp.float32))
    assert float(d.max()) < 0.2 and float(d.mean()) < 0.01


def test_gelu_poly_accuracy_f32():
    # Fit error is 3.3e-6 vs a float64 oracle; the device tanh approximation
    # widens this to ~6e-5 vs the device's own erf path (measured on v5e).
    x = jnp.asarray(np.linspace(-10, 10, 100001), jnp.float32)
    ref = jax.nn.gelu(x, approximate=False)
    out = gelu_exact_fast(x)
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-4


def test_gelu_poly_bf16_rounding_equivalence():
    # On bf16 inputs/outputs the poly form must agree with erf-GELU to at
    # most ONE bf16 ulp (one extra rounding step), mostly bit-equal.
    rng = np.random.default_rng(0)
    x32 = rng.standard_normal(200000).astype(np.float32) * 3.0
    xb = jnp.asarray(x32, jnp.bfloat16)
    a = np.asarray(exact_gelu(xb).astype(jnp.float32))
    b = np.asarray(jax.nn.gelu(xb.astype(jnp.float32), approximate=False).astype(jnp.bfloat16).astype(jnp.float32))
    bit_equal = (a == b).mean()
    assert bit_equal > 0.8, f"bit-equal fraction {bit_equal}"
    # every mismatch is either a single-ulp rounding flip, or sits in the
    # negative tail where |gelu| is absolutely tiny (< 1e-4)
    mism = a != b
    if mism.any():
        rel = np.abs(a[mism] - b[mism]) / np.maximum(np.abs(a[mism]), np.abs(b[mism]))
        # bf16 has 7 mantissa bits: one ulp is up to 2^-7 relative
        one_ulp = rel <= 2.0 ** -6.9
        tiny = np.abs(a[mism] - b[mism]) < 1e-4
        assert np.all(one_ulp | tiny), float(rel[~tiny].max())


def test_exact_gelu_routes_f32_to_xla():
    x = jnp.asarray(np.linspace(-3, 3, 1000), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(exact_gelu(x)), np.asarray(jax.nn.gelu(x, approximate=False))
    )
