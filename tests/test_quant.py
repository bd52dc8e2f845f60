"""int8 dynamic-quant serving path (ops/quant.py + BertConfig.quantize).

No reference counterpart (the reference serves fp32 torch) — this is the
beyond-parity TPU serving preset; these tests pin its math and bound its
drift so the knob stays honest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_int8_dense_matches_manual_reference():
    """int8_dense == the same quant math done by hand in numpy (the
    rounding/clipping/rescale recipe is part of the contract)."""
    from mdhs_tpu.ops.quant import int8_dense

    rng = np.random.default_rng(0)
    x = rng.normal(size=(6, 16)).astype(np.float32)
    w = rng.normal(size=(16, 8)).astype(np.float32)
    b = rng.normal(size=(8,)).astype(np.float32)

    sw = np.maximum(np.abs(w).max(axis=0), 1e-8) / 127.0
    w_i8 = np.clip(np.round(w / sw), -127, 127).astype(np.int8)
    sx = np.maximum(np.abs(x).max(axis=1, keepdims=True), 1e-8) / 127.0
    x_i8 = np.clip(np.round(x / sx), -127, 127).astype(np.int8)
    ref = (x_i8.astype(np.int32) @ w_i8.astype(np.int32)).astype(np.float32)
    ref = ref * sx * sw[None, :] + b[None, :]

    out = np.asarray(
        jax.jit(lambda x, w, b: int8_dense(x, w, b, out_dtype=jnp.float32))(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)
        )
    )
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)


def test_int8_dense_close_to_f32():
    """Quantization error on gaussian data is a few permille in Frobenius
    norm — the knob trades that for 2x MXU rate."""
    from mdhs_tpu.ops.quant import int8_dense

    rng = np.random.default_rng(1)
    x = rng.normal(size=(64, 256)).astype(np.float32)
    w = rng.normal(size=(256, 128)).astype(np.float32) * 0.05
    exact = x @ w
    q = np.asarray(
        jax.jit(lambda x, w: int8_dense(x, w, None, out_dtype=jnp.float32))(
            jnp.asarray(x), jnp.asarray(w)
        )
    )
    rel = np.linalg.norm(q - exact) / np.linalg.norm(exact)
    assert rel < 0.02, rel


def test_bert_int8_drift_bounded():
    """Tiny BERT, same params: quantize='int8' vs the exact path. CLS drift
    must stay small relative to the hidden-state scale, and the int8 knob
    must be a no-op when deterministic=False (training)."""
    import dataclasses

    from mdhs_tpu.models.bert import BertConfig, BertModel

    cfg = BertConfig.tiny()
    rng = jax.random.PRNGKey(0)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 500, (4, 24), np.int32))
    mask = jnp.ones((4, 24), jnp.int32)

    exact = BertModel(cfg, dtype=jnp.float32)
    variables = jax.jit(lambda r: exact.init(r, ids, mask))(rng)
    last_e, _ = jax.jit(lambda v: exact.apply(v, ids, mask))(variables)

    qcfg = dataclasses.replace(cfg, quantize="int8")
    quant = BertModel(qcfg, dtype=jnp.float32)
    last_q, _ = jax.jit(lambda v: quant.apply(v, ids, mask))(variables)

    scale = float(jnp.abs(last_e).max())
    drift = float(jnp.abs(last_q - last_e).max())
    assert drift < 0.05 * scale, (drift, scale)

    # not deterministic -> exact path (quantization never touches training)
    tr_e = exact.apply(variables, ids, mask, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(7)})[0]
    tr_q = quant.apply(variables, ids, mask, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(7)})[0]
    np.testing.assert_array_equal(np.asarray(tr_e), np.asarray(tr_q))


def test_quantize_knob_param_tree_interchange():
    """The int8 path must declare the exact same parameter tree as the
    exact path (checkpoints are interchangeable across serving modes)."""
    import dataclasses

    from mdhs_tpu.models.bert import BertConfig, BertModel

    cfg = BertConfig.tiny()
    rng = jax.random.PRNGKey(0)
    ids = jnp.zeros((2, 8), jnp.int32)

    def tree_shapes(model):
        v = jax.eval_shape(lambda r: model.init(r, ids), rng)
        return jax.tree_util.tree_map(lambda s: (s.shape, str(s.dtype)), v)

    a = tree_shapes(BertModel(cfg, dtype=jnp.float32))
    b = tree_shapes(BertModel(dataclasses.replace(cfg, quantize="int8"),
                              dtype=jnp.float32))
    assert a == b


# ---------------------------------------------------------------------------
# Fused Pallas int8 kernels (ops/quant_kernel.py)
# ---------------------------------------------------------------------------

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="Mosaic kernel lowering needs the TPU backend",
)


def _ffn_inputs(N=512, H=256, Di=1024, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(N, H)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(H, Di)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(Di,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(Di, H)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(H,)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(H,)) * 0.2 + 1.0, jnp.float32)
    be = jnp.asarray(rng.normal(size=(H,)) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2, g, be


def _attn_inputs(B=3, L=128, HD=256, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, L, HD)), jnp.bfloat16)
    wqkv = jnp.asarray(rng.normal(size=(HD, 3 * HD)) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.normal(size=(3 * HD,)) * 0.1, jnp.float32)
    wo = jnp.asarray(rng.normal(size=(HD, HD)) * 0.05, jnp.float32)
    bo = jnp.asarray(rng.normal(size=(HD,)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(HD,)) * 0.2 + 1.0, jnp.float32)
    be = jnp.asarray(rng.normal(size=(HD,)) * 0.1, jnp.float32)
    bias = jnp.where(
        jnp.asarray(rng.random((B, L)) > 0.2), 0.0, -1e9
    ).astype(jnp.float32)
    return x, wqkv, bqkv, wo, bo, g, be, bias


@pytest.mark.parametrize("act", ["erf", "tanh"])
def test_int8_ffn_kernel_interpret_parity(act):
    """Interpret-mode kernel == the XLA int8 composite reference, to the
    bf16 output quantum (the only intended deltas: poly-tanh erf form and
    f32-direct requantize of the GELU output; both sub-ULP here)."""
    from mdhs_tpu.ops.quant_kernel import int8_ffn_block, int8_ffn_block_reference

    args = _ffn_inputs()
    out_k = np.asarray(
        int8_ffn_block(*args, 1e-12, act, interpret=True), np.float32)
    out_r = np.asarray(int8_ffn_block_reference(*args, 1e-12, act), np.float32)
    scale = np.abs(out_r).max()
    assert np.abs(out_k - out_r).max() < 0.01 * scale


def test_int8_attention_kernel_interpret_parity():
    from mdhs_tpu.ops.quant_kernel import (
        int8_attention_block, int8_attention_block_reference)

    x, wqkv, bqkv, wo, bo, g, be, bias = _attn_inputs()
    nh = 4
    sm = (x.shape[-1] // nh) ** -0.5
    out_k = np.asarray(int8_attention_block(
        x, wqkv, bqkv, wo, bo, g, be, bias, nh, sm, 1e-12, interpret=True), np.float32)
    out_r = np.asarray(int8_attention_block_reference(
        x, wqkv, bqkv, wo, bo, g, be, bias, nh, sm, 1e-12), np.float32)
    scale = np.abs(out_r).max()
    assert np.abs(out_k - out_r).max() < 0.01 * scale


@requires_tpu
def test_int8_ffn_kernel_mosaic_parity():
    """Real Mosaic lowering on the chip (int8 MXU dots) vs the reference."""
    from mdhs_tpu.ops.quant_kernel import (
        int8_ffn_block, int8_ffn_block_reference, supports)

    args = _ffn_inputs(N=1024, H=256, Di=1024)
    assert supports(jnp.bfloat16, 1024, 256, 1024)
    out_k = np.asarray(jax.jit(
        lambda *a: int8_ffn_block(*a, 1e-12, "erf"))(*args), np.float32)
    out_r = np.asarray(int8_ffn_block_reference(*args, 1e-12, "erf"), np.float32)
    scale = np.abs(out_r).max()
    assert np.abs(out_k - out_r).max() < 0.01 * scale


@requires_tpu
def test_int8_attention_kernel_mosaic_parity():
    from mdhs_tpu.ops.quant_kernel import (
        attn_supports, int8_attention_block, int8_attention_block_reference)

    x, wqkv, bqkv, wo, bo, g, be, bias = _attn_inputs(B=4, L=128, HD=768)
    nh = 12
    sm = (768 // nh) ** -0.5
    assert attn_supports(jnp.bfloat16, 128, 768, nh)
    out_k = np.asarray(jax.jit(lambda *a: int8_attention_block(
        *a, nh, sm, 1e-12))(x, wqkv, bqkv, wo, bo, g, be, bias), np.float32)
    out_r = np.asarray(int8_attention_block_reference(
        x, wqkv, bqkv, wo, bo, g, be, bias, nh, sm, 1e-12), np.float32)
    scale = np.abs(out_r).max()
    assert np.abs(out_k - out_r).max() < 0.01 * scale


def test_trainer_plumbs_quantize_knob():
    """model.text_encoder.quantize reaches BertConfig for every family
    (bert_config_from is the shared builder)."""
    from mdhs_tpu.core.config import Config
    from mdhs_tpu.train.trainer import bert_config_from

    cfg = Config({"model": {"text_encoder": {"preset": "tiny",
                                             "quantize": "int8"}}})
    assert bert_config_from(cfg, vocab_size=100).quantize == "int8"
    assert bert_config_from(Config({}), vocab_size=100).quantize == "none"
