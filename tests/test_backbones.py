"""Backbone shape tests: ResNet taps, ConvNeXt, MambaVision, BERT hidden states."""

import jax
import jax.numpy as jnp
import pytest

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("backbone,c4", [("resnet18", 512), ("resnet50", 2048)])
def test_resnet_taps(backbone, c4):
    from mdhs_tpu.models.resnet import ResNet

    m = ResNet(backbone=backbone, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(lambda r: m.init(r, x))(KEY)
    taps = jax.jit(lambda v, x: m.apply(v, x))(
        {k: v[k] for k in ("params", "batch_stats")}, x
    )
    assert taps["layer4"].shape == (1, 2, 2, c4)
    assert taps["layer2"].shape[-1] == c4 // 4
    assert set(taps) == {"stem", "layer1", "layer2", "layer3", "layer4"}


def test_convnext_map():
    from mdhs_tpu.models.convnext import ConvNeXt

    m = ConvNeXt(variant="tiny", dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(lambda r: m.init(r, x))(KEY)
    out = jax.jit(m.apply)(v, x)
    assert out.shape == (1, 2, 2, 768)


def test_convnext_encoder_factory_autodetect():
    # Reference factory autodetects the backbone feature dim before the
    # projection (ConNexT/models/image_encoder.py:39-59); Flax shape
    # inference resolves it at init for any variant.
    from mdhs_tpu.models.convnext import create_convnext_encoder

    m = create_convnext_encoder(output_dim=256, model_variant="convnext_tiny",
                                dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(lambda r: m.init(r, x))(KEY)
    out = jax.jit(m.apply)(v, x)
    assert out.shape == (1, 256)
    # projection kernel input dim was inferred as the tiny stage-4 width
    assert v["params"]["projection"]["kernel"].shape == (768, 256)
    with pytest.raises(ValueError):
        create_convnext_encoder(model_variant="convnext_xxl")


def test_mamba_vision_encoder():
    from mdhs_tpu.models.mamba_vision import MambaVisionEncoder

    m = MambaVisionEncoder(variant="T", dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(lambda r: m.init(r, x))(KEY)
    out = jax.jit(lambda v, x: m.apply(v, x))(
        {k: v[k] for k in ("params", "batch_stats")}, x
    )
    assert out.shape == (1, 4, 640)  # 64/32=2 -> 2x2 tokens, dim 80*8


def test_s2d_stem_matches_plain_conv():
    """S2DStemConv computes the same dot products as the 7x7/s2/p3 stem conv
    (space-to-depth reorganization, docs/TRAIN_PERF.md): identical param
    tree, outputs equal up to summation order, odd spatial sizes fall back."""
    import numpy as np

    from mdhs_tpu.models.resnet import ResNet

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)),
                    jnp.float32)
    off = ResNet(backbone="resnet18", dtype=jnp.float32, s2d_stem="off")
    on = ResNet(backbone="resnet18", dtype=jnp.float32, s2d_stem="on")
    v = jax.jit(lambda r: off.init(r, x))(KEY)
    v_on = jax.jit(lambda r: on.init(r, x))(KEY)
    # identical parameter trees: checkpoints/converters are untouched
    assert jax.tree_util.tree_structure(v["params"]) == jax.tree_util.tree_structure(
        v_on["params"]
    )
    assert v["params"]["stem_conv"]["kernel"].shape == (7, 7, 3, 64)

    run = lambda m: jax.jit(lambda v, x: m.apply(v, x))(
        {k: v[k] for k in ("params", "batch_stats")}, x
    )
    t_off, t_on = run(off), run(on)
    for key in t_off:
        np.testing.assert_allclose(
            np.asarray(t_on[key]), np.asarray(t_off[key]), atol=3e-5, rtol=1e-5,
            err_msg=key,
        )

    # odd spatial size: "on" silently falls back to the plain conv
    x_odd = x[:, :63, :63, :]
    t_odd = jax.jit(lambda v, x: on.apply(v, x))(
        {k: v[k] for k in ("params", "batch_stats")}, x_odd
    )
    assert t_odd["stem"].shape[1] == t_odd["stem"].shape[2]


def test_image_token_encoder_mamba_vision_backbone():
    """image_encoder.backbone: mamba_vision_* is selectable in the baseline
    family (the reference wires the vendored backbone into its active model
    file, ConNexT/models/pl_model_MOE2.py:21): tokens + ResNet-named taps
    (stem/layer1..4) so fusion, Grad-CAM and multiscale all work."""
    from mdhs_tpu.models.encoders import ImageTokenEncoder

    m = ImageTokenEncoder(feature_dim=96, backbone="mamba_vision_T",
                          dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(lambda r: m.init(r, x))(KEY)
    tokens, taps = jax.jit(lambda v, x: m.apply(v, x))(
        {k: v[k] for k in ("params", "batch_stats")}, x
    )
    assert tokens.shape == (1, 4, 96)  # 64/32=2 -> 2x2 tokens
    assert set(taps) == {"stem", "layer1", "layer2", "layer3", "layer4"}
    assert taps["stem"].shape == (1, 16, 16, 80)      # /4, dim
    assert taps["layer2"].shape == (1, 8, 8, 160)     # /8, 2*dim
    assert taps["layer4"].shape == (1, 2, 2, 640)     # /32, 8*dim

    ms = ImageTokenEncoder(feature_dim=96, backbone="mamba_vision_T",
                           multi_scale=True, dtype=jnp.float32)
    v = jax.jit(lambda r: ms.init(r, x))(KEY)
    tokens, _ = jax.jit(lambda v, x: ms.apply(v, x))(
        {k: v[k] for k in ("params", "batch_stats")}, x
    )
    assert set(tokens) == {"layer2", "layer3", "layer4"}
    assert tokens["layer2"].shape == (1, 64, 96)


def test_bert_hidden_states():
    from mdhs_tpu.models.bert import BertConfig, BertModel

    cfg = BertConfig.tiny()
    m = BertModel(cfg, dtype=jnp.float32)
    ids = jnp.zeros((2, 12), jnp.int32)
    v = jax.jit(lambda r: m.init(r, ids))(KEY)
    last, all_h = jax.jit(m.apply)(v, ids)
    assert last.shape == (2, 12, cfg.hidden_size)
    assert len(all_h) == cfg.num_hidden_layers + 1  # embeddings + each layer


def test_multimodal_mamba_fusion():
    from mdhs_tpu.modules.multimodal_mamba import MultimodalMamba

    m = MultimodalMamba(text_dim=32, img_dim=24, hidden_dim=48, proj_dim=16,
                        use_kan_attention=True, num_heads=2, dtype=jnp.float32)
    text = jnp.zeros((2, 32))
    img = jnp.zeros((2, 9, 24))
    fh = jnp.zeros((2, 48))
    lh = jnp.zeros((2, 48))
    v = jax.jit(lambda r: m.init(r, text, img, fh, lh))(KEY)
    out = jax.jit(m.apply)(v, text, img, fh, lh)
    assert out.shape == (2, 12, 16)  # 1 + 9 + 1 + 1 tokens


def test_bert_flash_attention_parity():
    # Flash path (Pallas TPU kernel) vs exact XLA path, with a padding mask.
    # f32 accumulation inside the kernel -> close to the f32-softmax path.
    import dataclasses
    from mdhs_tpu.models.bert import BertConfig, BertModel

    if jax.default_backend() == "cpu":
        pytest.skip("Pallas TPU flash-attention kernel needs a TPU backend")

    cfg = dataclasses.replace(
        BertConfig.tiny(), num_attention_heads=1, hidden_size=128,
        intermediate_size=256, attention_impl="xla",  # pin: default "auto" would pick the fused kernel here
    )
    ids = jax.random.randint(KEY, (2, 128), 0, cfg.vocab_size)
    mask = jnp.concatenate(
        [jnp.ones((2, 100), jnp.int32), jnp.zeros((2, 28), jnp.int32)], axis=1
    )
    xla_model = BertModel(cfg, dtype=jnp.bfloat16)
    v = jax.jit(lambda r: xla_model.init(r, ids, mask))(KEY)
    ref, _ = jax.jit(xla_model.apply)(v, ids, mask)
    flash_model = BertModel(
        dataclasses.replace(cfg, attention_impl="flash"), dtype=jnp.bfloat16
    )
    out, _ = jax.jit(flash_model.apply)(v, ids, mask)
    # only non-padded positions are meaningful
    ref = jnp.asarray(ref, jnp.float32)[:, :100]
    out = jnp.asarray(out, jnp.float32)[:, :100]
    assert jnp.max(jnp.abs(ref - out)) < 0.05, float(jnp.max(jnp.abs(ref - out)))
