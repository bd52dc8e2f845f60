"""Numeric parity tests against PyTorch (cpu torch is available offline).

These pin the weight-conversion layouts and loss semantics that the
"bit-compatible logits" target depends on (SURVEY.md §7 hard parts):
- our Flax BERT vs transformers' torch BertModel with converted weights
- our MultiHeadAttention vs torch.nn.MultiheadAttention (packed + kdim/vdim)
- CE+label smoothing / focal / supcon vs torch reference formulas
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def to_np(sd):
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def test_bert_parity_vs_transformers():
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel as HFBertModel

    from mdhs_tpu.core.convert import convert_bert
    from mdhs_tpu.models.bert import BertConfig, BertModel

    hf_cfg = HFBertConfig(
        vocab_size=200,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = HFBertModel(hf_cfg).eval()

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 200, (3, 10)).astype(np.int64)
    mask = np.ones((3, 10), np.int64)
    mask[1, 6:] = 0
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    params, _pooler = convert_bert(to_np(hf.state_dict()), num_layers=2, prefix="")
    cfg = BertConfig(
        vocab_size=200, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    model = BertModel(cfg, dtype=jnp.float32)
    out, _ = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(mask.astype(np.int32)),
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("cross", [False, True])
def test_mha_parity_vs_torch(cross):
    from mdhs_tpu.core.convert import convert_torch_mha
    from mdhs_tpu.modules.attention import MultiHeadAttention

    E, H, Nq, Nk, B = 16, 4, 5, 7, 2
    kdim = 24 if cross else E
    torch.manual_seed(1)
    tm = torch.nn.MultiheadAttention(
        E, H, dropout=0.0, batch_first=True, kdim=kdim, vdim=kdim
    ).eval()

    rng = np.random.default_rng(1)
    q = rng.normal(size=(B, Nq, E)).astype(np.float32)
    kv = rng.normal(size=(B, Nk, kdim)).astype(np.float32)
    kp_mask = np.zeros((B, Nk), bool)
    kp_mask[0, 4:] = True  # torch: True = ignore
    with torch.no_grad():
        ref, _ = tm(
            torch.tensor(q), torch.tensor(kv), torch.tensor(kv),
            key_padding_mask=torch.tensor(kp_mask),
        )
    ref = ref.numpy()

    params = convert_torch_mha(to_np(tm.state_dict()), embed_dim=E)
    # kdim/vdim are torch-side only: Flax Dense infers the k/v input dims
    # from the operand shapes (the module's former kdim/vdim fields were dead)
    ours = MultiHeadAttention(E, H, dropout=0.0, dtype=jnp.float32)
    out = ours.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv),
        key_padding_mask=jnp.asarray((~kp_mask).astype(np.int32)),
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_ce_label_smoothing_parity():
    from mdhs_tpu.train.losses import cross_entropy

    rng = np.random.default_rng(2)
    logits = rng.normal(size=(8, 7)).astype(np.float32)
    labels = rng.integers(0, 7, 8)
    weights = rng.uniform(0.5, 2.0, 7).astype(np.float32)

    ref = torch.nn.functional.cross_entropy(
        torch.tensor(logits), torch.tensor(labels), label_smoothing=0.02,
    ).item()
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels), label_smoothing=0.02))
    assert abs(ref - ours) < 1e-5

    ref_w = torch.nn.functional.cross_entropy(
        torch.tensor(logits), torch.tensor(labels), weight=torch.tensor(weights),
    ).item()
    ours_w = float(
        cross_entropy(jnp.asarray(logits), jnp.asarray(labels), class_weights=jnp.asarray(weights))
    )
    assert abs(ref_w - ours_w) < 1e-5


def test_focal_loss_parity():
    from mdhs_tpu.train.losses import focal_loss

    rng = np.random.default_rng(3)
    logits = rng.normal(size=(8, 7)).astype(np.float32)
    labels = rng.integers(0, 7, 8)
    ce = torch.nn.functional.cross_entropy(
        torch.tensor(logits), torch.tensor(labels), reduction="none"
    )
    pt = torch.exp(-ce)
    ref = (((1 - pt) ** 2.0) * ce).mean().item()
    ours = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=2.0))
    assert abs(ref - ours) < 1e-4


def test_supcon_parity():
    from mdhs_tpu.train.losses import supcon_loss

    rng = np.random.default_rng(4)
    feats = rng.normal(size=(8, 16)).astype(np.float32)
    labels = np.asarray([0, 0, 1, 1, 2, 2, 3, 3])

    f = torch.nn.functional.normalize(torch.tensor(feats), dim=1)
    logits = f @ f.T / 0.07
    logits = logits - logits.max(dim=1, keepdim=True).values
    lt = torch.tensor(labels).view(-1, 1)
    mask = torch.eq(lt, lt.T).float()
    mask.fill_diagonal_(0)
    exp_logits = torch.exp(logits) * (1 - torch.eye(8))
    log_prob = logits - torch.log(exp_logits.sum(dim=1, keepdim=True) + 1e-8)
    mlpp = (mask * log_prob).sum(dim=1) / (mask.sum(dim=1) + 1e-8)
    ref = (-mlpp.mean()).item()
    ours = float(supcon_loss(jnp.asarray(feats), jnp.asarray(labels), 0.07))
    assert abs(ref - ours) < 1e-5


def test_mibf_kl_parity():
    from mdhs_tpu.train.losses import kl_divergence

    rng = np.random.default_rng(5)
    p = torch.softmax(torch.tensor(rng.normal(size=(4, 6)).astype(np.float32)), dim=-1)
    q = torch.softmax(torch.tensor(rng.normal(size=(4, 6)).astype(np.float32)), dim=-1)
    pc = torch.clamp(p, min=1e-8, max=1.0)
    qc = torch.clamp(q, min=1e-8, max=1.0)
    ref = torch.sum(pc * (torch.log(pc) - torch.log(qc)), dim=-1).numpy()
    ours = np.asarray(kl_divergence(jnp.asarray(p.numpy()), jnp.asarray(q.numpy())))
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_resnet_converter_roundtrip():
    """Converter consumes torchvision-style names and produces trees that
    exactly match our ResNet's init structure."""
    import flax

    from mdhs_tpu.core.convert import convert_resnet
    from mdhs_tpu.models.resnet import ResNet

    model = ResNet(backbone="resnet18", dtype=jnp.float32)
    variables = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, 32, 32, 3)))
    )(jax.random.PRNGKey(0))

    # synthesize a torchvision-style state dict with matching shapes
    sd = {}
    flat = flax.traverse_util.flatten_dict(variables["params"], sep="/")
    stats = flax.traverse_util.flatten_dict(variables["batch_stats"], sep="/")

    def tv_name(fname):
        if fname.startswith("stem_conv"):
            return "conv1"
        if fname.startswith("stem_bn"):
            return "bn1"
        # layer{i}_block{j}/<p>
        blk, leaf = fname.split("/", 1)
        stage, b = blk.replace("layer", "").split("_block")
        leaf = leaf.split("/")[0]
        mapping = {"conv1": "conv1", "conv2": "conv2", "bn1": "bn1", "bn2": "bn2",
                   "downsample_conv": "downsample.0", "downsample_bn": "downsample.1"}
        return f"layer{stage}.{b}.{mapping[leaf]}"

    rng = np.random.default_rng(0)
    for key, val in flat.items():
        tv = tv_name(key)
        leaf = key.split("/")[-1]
        if leaf == "kernel":
            sd[f"{tv}.weight"] = rng.normal(size=np.transpose(val, (3, 2, 0, 1)).shape).astype(np.float32)
        elif leaf == "scale":
            sd[f"{tv}.weight"] = rng.normal(size=val.shape).astype(np.float32)
        elif leaf == "bias":
            sd[f"{tv}.bias"] = rng.normal(size=val.shape).astype(np.float32)
    for key, val in stats.items():
        tv = tv_name(key)
        leaf = key.split("/")[-1]
        sd[f"{tv}.running_{'mean' if leaf == 'mean' else 'var'}"] = rng.uniform(
            0.5, 1.5, val.shape
        ).astype(np.float32)

    params, batch_stats = convert_resnet(sd, "resnet18")
    conv_flat = flax.traverse_util.flatten_dict(params, sep="/")
    assert set(conv_flat) == set(flat)
    for k in flat:
        assert conv_flat[k].shape == flat[k].shape, k
    conv_stats = flax.traverse_util.flatten_dict(batch_stats, sep="/")
    assert set(conv_stats) == set(stats)
