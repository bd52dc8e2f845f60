"""End-to-end logit parity: complete converted models vs torch twins.

The torch twins below are differential-test fixtures assembled from PUBLIC
torch / torchvision / transformers APIs, using the reference repo's module
naming (mibf_net/model_resnet.py:10-63, attention.py:31-70; model.py:60-200,
modules/fusion_blocks.py) so convert_mibf_full / convert_baseline_full can
consume their state_dicts directly. Random weights, f32, eval mode — this is
the offline-verifiable route to the "bit-compatible logits" north star.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def to_np(sd):
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def as_jax(tree):
    # jnp.array (copy=True), NOT jnp.asarray: on the CPU backend asarray
    # zero-copy-aliases numpy views of torch storage, so a later in-place
    # torch opt.step() would silently mutate the "converted" jax params
    # (on TPU asarray always copies, masking the hazard).
    return jax.tree_util.tree_map(jnp.array, tree)


# ---------------------------------------------------------------------------
# Plain-torch ResNet twin with torchvision naming (torchvision is not in this
# image; conv1/bn1/layerX.Y.{convZ,bnZ,downsample.0/1}/fc keys match it).
# ---------------------------------------------------------------------------

class TBasicBlock(tnn.Module):
    expansion = 1

    def __init__(self, cin, w, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, w, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(w)
        self.conv2 = tnn.Conv2d(w, w, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(w)
        self.downsample = None
        if stride != 1 or cin != w:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, w, 1, stride, bias=False), tnn.BatchNorm2d(w)
            )

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + r)


class TBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, cin, w, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, w, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(w)
        self.conv2 = tnn.Conv2d(w, w, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(w)
        self.conv3 = tnn.Conv2d(w, w * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(w * 4)
        self.downsample = None
        if stride != 1 or cin != w * 4:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, w * 4, 1, stride, bias=False), tnn.BatchNorm2d(w * 4)
            )

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(y + r)


class TorchResNet(tnn.Module):
    """torchvision-named resnet18/50; fc replaced or Identity by caller."""

    def __init__(self, backbone="resnet18", num_outputs=None):
        super().__init__()
        block = TBasicBlock if backbone in ("resnet18", "resnet34") else TBottleneck
        sizes = {"resnet18": [2, 2, 2, 2], "resnet34": [3, 4, 6, 3],
                 "resnet50": [3, 4, 6, 3]}[backbone]
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cin = 64
        for i, (n, w) in enumerate(zip(sizes, [64, 128, 256, 512])):
            blocks = []
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                blocks.append(block(cin, w, stride))
                cin = w * block.expansion
            setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))
        self.avgpool = tnn.AdaptiveAvgPool2d(1)
        self.fc = tnn.Linear(cin, num_outputs) if num_outputs else tnn.Identity()

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(self.avgpool(x).flatten(1))


def perturb_batchnorms(model, seed=0):
    """Randomize BN affine params + running stats so the converter's
    scale/bias/mean/var mapping is actually exercised (defaults are 1/0/0/1,
    which would mask swaps)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.weight.uniform_(0.8, 1.2, generator=g)
                m.bias.uniform_(-0.1, 0.1, generator=g)
                m.running_mean.uniform_(-0.1, 0.1, generator=g)
                m.running_var.uniform_(0.8, 1.2, generator=g)


# ---------------------------------------------------------------------------
# MIBF (Resnet50WithOurs twin)
# ---------------------------------------------------------------------------

class TorchJointKV(tnn.Module):
    """Joint-KV cross attention: Q from x over [Kx ++ Ky] / [Vx ++ Vy]
    (the reference's MultiHeadCrossAttention_v2 math)."""

    def __init__(self, dim, num_heads):
        super().__init__()
        self.dim, self.h, self.hd = dim, num_heads, dim // num_heads
        self.toK_x = tnn.Linear(dim, dim)
        self.toQ_x = tnn.Linear(dim, dim)
        self.toV_x = tnn.Linear(dim, dim)
        self.toK_y = tnn.Linear(dim, dim)
        self.toV_y = tnn.Linear(dim, dim)
        self.to_out = tnn.Linear(dim, dim)

    def forward(self, x, y):
        B, Lx, _ = x.shape
        Ly = y.shape[1]

        def sp(t, L):
            return t.view(B, L, self.h, self.hd).transpose(1, 2)

        q = sp(self.toQ_x(x), Lx)
        k = torch.cat([sp(self.toK_x(x), Lx), sp(self.toK_y(y), Ly)], dim=2)
        v = torch.cat([sp(self.toV_x(x), Lx), sp(self.toV_y(y), Ly)], dim=2)
        attn = torch.softmax(q @ k.transpose(-2, -1) / self.hd**0.5, dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, Lx, self.dim)
        return self.to_out(out)


class TorchBertCLS(tnn.Module):
    def __init__(self, hf_cfg):
        super().__init__()
        from transformers import BertModel

        self.bert = BertModel(hf_cfg)

    def forward(self, ids, mask):
        return self.bert(input_ids=ids, attention_mask=mask).last_hidden_state[:, 0, :]


class TorchMIBF(tnn.Module):
    def __init__(self, num_labels, hf_cfg):
        super().__init__()
        self.text_encoder = TorchBertCLS(hf_cfg)
        self.image_encoder = TorchResNet("resnet50", num_outputs=768)
        self.textbased_cross_attention = TorchJointKV(768, 1)
        self.imagbased_cross_attention = TorchJointKV(768, 1)
        self.fc = tnn.Linear(768 * 2, num_labels)
        self.fc_image = tnn.Sequential(
            tnn.Flatten(1), tnn.Linear(768, 512), tnn.ReLU(), tnn.Linear(512, num_labels)
        )
        self.fc_text = tnn.Sequential(
            tnn.Flatten(1), tnn.Linear(768, 512), tnn.ReLU(), tnn.Linear(512, num_labels)
        )

    def forward(self, img, ids, mask):
        t = self.text_encoder(ids, mask).unsqueeze(1)
        i = self.image_encoder(img).unsqueeze(1)
        tf = self.textbased_cross_attention(i, t)
        imf = self.imagbased_cross_attention(t, i)
        p1 = tf.view(img.shape[0], 768)
        p2 = imf.view(img.shape[0], 768)
        return {
            "image_text": self.fc(torch.cat([p1, p2], dim=1)),
            "text": self.fc_text(tf),
            "image": self.fc_image(imf),
        }


def test_mibf_full_model_logit_parity():
    from transformers import BertConfig as HFBertConfig

    from mdhs_tpu.core.convert import convert_mibf_full
    from mdhs_tpu.models.bert import BertConfig
    from mdhs_tpu.models.mibf import MIBFNet

    hf_cfg = HFBertConfig(
        vocab_size=128, hidden_size=768, num_hidden_layers=1,
        num_attention_heads=12, intermediate_size=128,
        max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    tm = TorchMIBF(num_labels=6, hf_cfg=hf_cfg).eval()
    perturb_batchnorms(tm, seed=7)

    rng = np.random.default_rng(0)
    B, S, L = 2, 64, 12
    img = rng.normal(size=(B, 3, S, S)).astype(np.float32)
    ids = rng.integers(0, 128, (B, L)).astype(np.int64)
    mask = np.ones((B, L), np.int64)
    mask[1, 8:] = 0
    with torch.no_grad():
        ref = tm(torch.tensor(img), torch.tensor(ids), torch.tensor(mask))
    ref = {k: v.numpy() for k, v in ref.items()}

    params, stats = convert_mibf_full(to_np(tm.state_dict()), num_bert_layers=1)
    bert = BertConfig(
        vocab_size=128, hidden_size=768, num_hidden_layers=1,
        num_attention_heads=12, intermediate_size=128,
        max_position_embeddings=64, hidden_dropout=0.0, attention_dropout=0.0,
    )
    model = MIBFNet(num_labels=6, bert=bert, dtype=jnp.float32)
    out = jax.jit(
        lambda v, i, t, m: model.apply(v, i, t, m)
    )(
        {"params": as_jax(params), "batch_stats": as_jax(stats)},
        jnp.asarray(np.transpose(img, (0, 2, 3, 1))),  # NCHW -> NHWC
        jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(mask.astype(np.int32)),
    )
    for key in ("image_text", "text", "image"):
        np.testing.assert_allclose(
            np.asarray(out[key]), ref[key], atol=2e-4, rtol=1e-3, err_msg=key
        )


# ---------------------------------------------------------------------------
# Baseline (MultimodalBaselineModel twin)
# ---------------------------------------------------------------------------

class TorchImageEncoder(tnn.Module):
    def __init__(self, feature_dim, multi_scale=False):
        super().__init__()
        self.model = TorchResNet("resnet18")
        self.multi_scale = multi_scale
        if multi_scale:
            self.proj2 = tnn.Linear(128, feature_dim)
            self.proj3 = tnn.Linear(256, feature_dim)
        self.proj4 = tnn.Linear(512, feature_dim)

    def forward(self, x):
        m = self.model
        x = m.maxpool(m.relu(m.bn1(m.conv1(x))))
        x = m.layer1(x)
        f2 = m.layer2(x)
        f3 = m.layer3(f2)
        f4 = m.layer4(f3)

        def fp(f, proj):
            return proj(f.flatten(2).transpose(1, 2))

        if self.multi_scale:
            return {"layer2": fp(f2, self.proj2), "layer3": fp(f3, self.proj3),
                    "layer4": fp(f4, self.proj4)}
        return fp(f4, self.proj4)


class TorchTextEncoder(tnn.Module):
    def __init__(self, hf_cfg):
        super().__init__()
        from transformers import BertModel

        self.model = BertModel(hf_cfg)

    def forward(self, ids, mask):
        return self.model(input_ids=ids, attention_mask=mask).last_hidden_state


class TorchBasicTB(tnn.Module):
    def __init__(self, dim, context_dim, num_heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = tnn.MultiheadAttention(dim, num_heads, dropout=0.0, batch_first=True)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = tnn.MultiheadAttention(
            dim, num_heads, dropout=0.0, batch_first=True,
            kdim=context_dim, vdim=context_dim,
        )
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = tnn.Sequential(
            tnn.Linear(dim, dim * 4), tnn.GELU(), tnn.Dropout(0.0), tnn.Linear(dim * 4, dim)
        )

    def forward(self, x, context, context_mask=None):
        r = x
        h = self.norm1(x)
        h, _ = self.attn1(h, h, h)
        x = r + h
        r = x
        h = self.norm2(x)
        kp = None if context_mask is None else (context_mask == 0)
        h, _ = self.attn2(h, context, context, key_padding_mask=kp)
        x = r + h
        return x + self.ff(self.norm3(x))


class TorchBasicFusion(tnn.Module):
    def __init__(self, text_dim, hidden_dim, num_heads):
        super().__init__()
        self.transformer_block = TorchBasicTB(hidden_dim, text_dim, num_heads)

    def forward(self, img_tokens, txt_tokens, txt_mask=None):
        return self.transformer_block(img_tokens, txt_tokens, txt_mask).mean(dim=1)


class TorchConcatFusion(tnn.Module):
    def __init__(self, text_dim, hidden_dim):
        super().__init__()
        self.proj = tnn.Linear(hidden_dim + text_dim, hidden_dim)

    def forward(self, img_tokens, txt_tokens, txt_mask=None):
        return self.proj(torch.cat([img_tokens.mean(dim=1), txt_tokens[:, 0, :]], dim=1))


class TorchCrossAttnBlock(tnn.Module):
    def __init__(self, text_dim, hidden_dim, num_heads):
        super().__init__()
        self.txt_proj = tnn.Linear(text_dim, hidden_dim)
        self.attn = tnn.MultiheadAttention(hidden_dim, num_heads, dropout=0.0, batch_first=True)
        self.norm = tnn.LayerNorm(hidden_dim)

    def forward(self, img_tokens, txt_tokens, txt_mask=None):
        t = self.txt_proj(txt_tokens)
        kp = None if txt_mask is None else (txt_mask == 0)
        a, _ = self.attn(img_tokens, t, t, key_padding_mask=kp)
        return self.norm(img_tokens + a)


class TorchMultiScaleFusion(tnn.Module):
    def __init__(self, text_dim, hidden_dim, num_heads):
        super().__init__()
        self.cross_l2 = TorchCrossAttnBlock(text_dim, hidden_dim, num_heads)
        self.cross_l3 = TorchCrossAttnBlock(text_dim, hidden_dim, num_heads)
        self.cross_l4 = TorchCrossAttnBlock(text_dim, hidden_dim, num_heads)

    def forward(self, img_tokens, txt_tokens, txt_mask=None):
        t2 = self.cross_l2(img_tokens["layer2"], txt_tokens, txt_mask).mean(dim=1)
        t3 = self.cross_l3(img_tokens["layer3"], txt_tokens, txt_mask).mean(dim=1)
        t4 = self.cross_l4(img_tokens["layer4"], txt_tokens, txt_mask).mean(dim=1)
        return (t2 + t3 + t4) / 3.0


class TorchBaseline(tnn.Module):
    def __init__(self, hf_cfg, fusion_type, num_classes=7, hidden_dim=64,
                 text_dim=32, num_heads=8):
        super().__init__()
        self.image_encoder = TorchImageEncoder(
            hidden_dim, multi_scale=(fusion_type == "multiscale")
        )
        self.text_encoder = TorchTextEncoder(hf_cfg)
        if fusion_type == "basic":
            self.fusion = TorchBasicFusion(text_dim, hidden_dim, num_heads)
        elif fusion_type == "concat":
            self.fusion = TorchConcatFusion(text_dim, hidden_dim)
        else:
            self.fusion = TorchMultiScaleFusion(text_dim, hidden_dim, num_heads)
        self.classifier = tnn.Sequential(
            tnn.Linear(hidden_dim, hidden_dim), tnn.ReLU(), tnn.Dropout(0.0),
            tnn.Linear(hidden_dim, num_classes),
        )

    def forward(self, img, ids, mask):
        tokens = self.image_encoder(img)
        txt = self.text_encoder(ids, mask)
        fused = self.fusion(tokens, txt, mask)
        return self.classifier(fused)


def test_moe_gating_differential():
    """Port of the reference's noisy top-k gating + quirky `_prob_in_top_k`
    (ConNexT/models/block/moe.py:198-265) in torch ops, with injected noise:
    gates must match both our modes; load must match load_mode="reference"
    exactly. Our default "consistent" mode deviates deliberately (documented
    in modules/moe.py)."""
    from mdhs_tpu.modules.moe import noisy_top_k_gating

    B, D, E, k = 6, 8, 4, 2
    rng = np.random.default_rng(9)
    x = rng.normal(size=(B, D)).astype(np.float32)
    w_gate = rng.normal(size=(D, E)).astype(np.float32)
    w_noise = rng.normal(size=(D, E)).astype(np.float32) * 0.1
    noise = rng.normal(size=(B, E)).astype(np.float32)

    xt = torch.tensor(x)
    clean = xt @ torch.tensor(w_gate)
    noise_std = torch.nn.functional.softplus(xt @ torch.tensor(w_noise)) + 1e-2
    noisy = clean + torch.tensor(noise) * noise_std
    logits = torch.softmax(noisy, dim=1)
    top_logits, top_idx = logits.topk(min(k + 1, E), dim=1)
    top_k_logits = top_logits[:, :k]
    top_k_gates = top_k_logits / (top_k_logits.sum(1, keepdim=True) + 1e-6)
    ref_gates = torch.zeros_like(logits).scatter(1, top_idx[:, :k], top_k_gates)
    # quirky load: softmaxed thresholds vs raw values
    thr_in = top_logits[:, k].unsqueeze(1)
    thr_out = top_logits[:, k - 1].unsqueeze(1)
    is_in = noisy > thr_in
    normal = torch.distributions.Normal(0.0, 1.0)
    p_in = normal.cdf((clean - thr_in) / noise_std)
    p_out = normal.cdf((clean - thr_out) / noise_std)
    ref_load = torch.where(is_in, p_in, p_out).sum(0)

    for mode in ("reference", "consistent"):
        gates, load = noisy_top_k_gating(
            jnp.asarray(x), jnp.asarray(w_gate), jnp.asarray(w_noise), k,
            train=True, noise=jnp.asarray(noise), load_mode=mode,
        )
        np.testing.assert_allclose(np.asarray(gates), ref_gates.numpy(),
                                   atol=1e-5, err_msg=mode)
        if mode == "reference":
            np.testing.assert_allclose(np.asarray(load), ref_load.numpy(), atol=1e-4)
        else:
            # the corrected estimator intentionally differs from the quirk
            assert not np.allclose(np.asarray(load), ref_load.numpy(), atol=1e-3)


def test_pretrained_path_config_wires_towers(tmp_path):
    """model.{image,text}_encoder.pretrained_path consume raw torch state
    dicts at Trainer build (reference encoder.py:22-61, scripts/train.py:185)."""
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel as HFBertModel

    from mdhs_tpu.core.config import Config
    from mdhs_tpu.data.synthetic import generate_synthetic_dataset, synthetic_config
    from mdhs_tpu.train.trainer import Trainer

    torch.manual_seed(2)
    img_twin = TorchResNet("resnet18")
    perturb_batchnorms(img_twin, seed=3)
    hf = HFBertModel(HFBertConfig(
        vocab_size=30522, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128, max_position_embeddings=128,
    )).eval()
    img_path = str(tmp_path / "resnet18.pth")
    txt_path = str(tmp_path / "bert.pth")
    torch.save(img_twin.state_dict(), img_path)
    torch.save(hf.state_dict(), txt_path)

    paths = generate_synthetic_dataset(str(tmp_path / "data"), num_images=8, image_size=48)
    cd = synthetic_config(paths, str(tmp_path), batch_size=4, num_epochs=1, max_length=16)
    cd["data"]["canvas"] = 56
    cd["data"]["image_size"] = 48
    cd["model"]["image_encoder"]["pretrained_path"] = img_path
    cd["model"]["text_encoder"]["pretrained_path"] = txt_path
    tr = Trainer(Config(cd), family="baseline", output_dir=str(tmp_path / "run"))

    # stem conv kernel must equal the converted torch conv1 (OIHW -> HWIO)
    got = np.asarray(tr.state.params["image_encoder"]["trunk"]["stem_conv"]["kernel"])
    want = np.transpose(img_twin.state_dict()["conv1.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(got, want, atol=1e-6)
    # BN running stats flow into batch_stats
    got_var = np.asarray(tr.state.batch_stats["image_encoder"]["trunk"]["stem_bn"]["var"])
    np.testing.assert_allclose(got_var, img_twin.bn1.running_var.numpy(), atol=1e-6)
    # BERT word embeddings imported
    got_emb = np.asarray(tr.state.params["text_encoder"]["bert"]["word_embeddings"]["embedding"])
    want_emb = hf.state_dict()["embeddings.word_embeddings.weight"].numpy()
    np.testing.assert_allclose(got_emb, want_emb, atol=1e-6)


@pytest.mark.parametrize("fusion_type", ["basic", "concat", "multiscale"])
def test_baseline_full_model_logit_parity(fusion_type):
    from transformers import BertConfig as HFBertConfig

    from mdhs_tpu.core.convert import convert_baseline_full
    from mdhs_tpu.models.baseline import BaselineConfig, MultimodalBaselineModel
    from mdhs_tpu.models.bert import BertConfig

    hf_cfg = HFBertConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(1)
    tm = TorchBaseline(hf_cfg, fusion_type).eval()
    perturb_batchnorms(tm, seed=11)

    rng = np.random.default_rng(1)
    B, S, L = 2, 64, 10
    img = rng.normal(size=(B, 3, S, S)).astype(np.float32)
    ids = rng.integers(0, 100, (B, L)).astype(np.int64)
    mask = np.ones((B, L), np.int64)
    mask[0, 6:] = 0
    with torch.no_grad():
        ref = tm(torch.tensor(img), torch.tensor(ids), torch.tensor(mask)).numpy()

    params, stats = convert_baseline_full(
        to_np(tm.state_dict()), fusion_type=fusion_type,
        classifier_type="mlp", backbone="resnet18", num_bert_layers=2,
    )
    bert = BertConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    cfg = BaselineConfig(
        num_classes=7, hidden_dim=64, text_feature_dim=32, dropout=0.0,
        image_backbone="resnet18", fusion_type=fusion_type,
        classifier_type="mlp", bert=bert,
    )
    model = MultimodalBaselineModel(cfg, dtype=jnp.float32)
    out = jax.jit(
        lambda v, i, t, m: model.apply(v, i, t, m)
    )(
        {"params": as_jax(params), "batch_stats": as_jax(stats)},
        jnp.asarray(np.transpose(img, (0, 2, 3, 1))),
        jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(mask.astype(np.int32)),
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# ConNexT twin: OurClassfierConvnextV2 (reference ConNexT/models/ourmodel.py
# :9-95) with the HF ConvNextModel tower, wrapped in the Lightning
# Model4AAAI_MoE nesting (net.net.*, pl_model_MOE2.py:59-77,111), plus the
# KAN-expert MoE head (moe.py:142-292, kan1.py:9-166) for head="moe".
# ---------------------------------------------------------------------------

class TorchKANLinear(tnn.Module):
    """efficient-KAN layer (reference kan1.py:9-166): silu(x)@Wb^T +
    b_splines(x)@ (Ws*scaler)^T, grid buffer (in, G+2K+1)."""

    def __init__(self, fin, fout, G=5, K=3):
        super().__init__()
        h = 2.0 / G
        grid = torch.arange(-K, G + K + 1, dtype=torch.float32) * h - 1.0
        self.register_buffer("grid", grid.expand(fin, -1).contiguous())
        self.base_weight = tnn.Parameter(torch.randn(fout, fin) * 0.3)
        self.spline_weight = tnn.Parameter(torch.randn(fout, fin, G + K) * 0.1)
        self.spline_scaler = tnn.Parameter(torch.randn(fout, fin) * 0.3)
        self.K = K

    def b_splines(self, x):
        grid = self.grid
        x = x.unsqueeze(-1)
        bases = ((x >= grid[:, :-1]) & (x < grid[:, 1:])).to(x.dtype)
        for k in range(1, self.K + 1):
            bases = (
                (x - grid[:, : -(k + 1)])
                / (grid[:, k:-1] - grid[:, : -(k + 1)])
                * bases[:, :, :-1]
            ) + (
                (grid[:, k + 1 :] - x)
                / (grid[:, k + 1 :] - grid[:, 1:(-k)])
                * bases[:, :, 1:]
            )
        return bases

    def forward(self, x):
        base = torch.nn.functional.linear(
            torch.nn.functional.silu(x), self.base_weight
        )
        sw = self.spline_weight * self.spline_scaler.unsqueeze(-1)
        spline = torch.nn.functional.linear(
            self.b_splines(x).flatten(1), sw.flatten(1)
        )
        return base + spline


class TorchKAN1(tnn.Module):
    def __init__(self, layers_hidden):
        super().__init__()
        self.layers = tnn.ModuleList(
            [TorchKANLinear(a, b) for a, b in zip(layers_hidden, layers_hidden[1:])]
        )

    def forward(self, x):
        for layer in self.layers:
            x = layer(x)
        return x


class TorchMoE(tnn.Module):
    """Eval-path sparse MoE (reference moe.py:242-292 with noisy gating off):
    softmax -> top-k -> renormalize; dense gate-weighted combine is exactly
    SparseDispatcher's gather/combine for the selected experts."""

    def __init__(self, fin, fout, num_experts, k, expert_layers):
        super().__init__()
        self.experts = tnn.ModuleList(
            [TorchKAN1(expert_layers) for _ in range(num_experts)]
        )
        self.w_gate = tnn.Parameter(torch.randn(fin, num_experts) * 0.2)
        self.w_noise = tnn.Parameter(torch.zeros(fin, num_experts))
        self.k, self.E = k, num_experts

    def forward(self, x):
        probs = torch.softmax(x @ self.w_gate, dim=1)
        top, idx = probs.topk(min(self.k + 1, self.E), dim=1)
        topk = top[:, : self.k]
        gk = topk / (topk.sum(1, keepdim=True) + 1e-6)
        gates = torch.zeros_like(probs).scatter(1, idx[:, : self.k], gk)
        out = torch.stack([e(x) for e in self.experts], dim=1)  # (B, E, out)
        return (gates.unsqueeze(-1) * out).sum(1)


class TorchConvCross(tnn.Module):
    """1x1-conv QKV cross attention (reference ourmodel.py:9-31)."""

    def __init__(self, dim):
        super().__init__()
        self.query_conv = tnn.Conv2d(dim, dim, 1)
        self.key_conv = tnn.Conv2d(dim, dim, 1)
        self.value_conv = tnn.Conv2d(dim, dim, 1)

    def forward(self, x, y):
        q = self.query_conv(x)
        k = self.key_conv(y)
        v = self.value_conv(y)
        attn = torch.softmax(
            q.flatten(2).permute(0, 2, 1) @ k.flatten(2), dim=-1
        )
        out = attn @ v.flatten(2).permute(0, 2, 1)
        return out.permute(0, 2, 1).view(x.size())


class TorchOurClassifier(tnn.Module):
    """OurClassfierConvnextV2 twin, HF tower path (ourmodel.py:34-95)."""

    def __init__(self, hf_bert_cfg, cnx_cfg, num_labels, fusion_dim,
                 head="linear", expert_layers=None):
        super().__init__()
        from transformers import BertModel as HFBertModel
        from transformers import ConvNextModel

        class _BertEncoder(tnn.Module):  # reference BERT.py:7-21
            def __init__(self):
                super().__init__()
                self.bert = HFBertModel(hf_bert_cfg)

            def forward(self, ids, mask):
                return self.bert(
                    input_ids=ids, attention_mask=mask
                ).last_hidden_state[:, 0, :]

        self.text_encoder = _BertEncoder()
        self.image_encoder = ConvNextModel(cnx_cfg)
        self.conv = tnn.Conv2d(cnx_cfg.hidden_sizes[-1], fusion_dim, 1)
        self.textbased_cross_attention = TorchConvCross(fusion_dim)
        self.imagbased_cross_attention = TorchConvCross(fusion_dim)
        self.head = head
        if head == "moe":
            self.moe = TorchMoE(fusion_dim, num_labels, 4, 2, expert_layers)
        else:
            self.fc = tnn.Linear(fusion_dim, num_labels)

    def forward(self, img, ids, mask):
        t = self.text_encoder(ids, mask)
        im = self.image_encoder(img).last_hidden_state
        imr = self.conv(im)
        te = t.unsqueeze(-1).unsqueeze(-1)
        p1 = self.textbased_cross_attention(imr, te).mean(dim=(2, 3))
        p2 = self.imagbased_cross_attention(te, imr).mean(dim=(2, 3))
        fused = p1 + p2
        return self.moe(fused) if self.head == "moe" else self.fc(fused)


class _LightningWrap(tnn.Module):
    def __init__(self, inner):
        super().__init__()
        self.net = inner


@pytest.mark.parametrize("head", ["linear", "moe"])
def test_connext_full_model_logit_parity(head):
    """End-to-end ConNexT logit parity through convert_connext_full: the
    route that makes the reference's headline 93.41% HAM checkpoint
    (docs/test_commands.md:25-32, predict.py:53-57) loadable."""
    from transformers import BertConfig as HFBertConfig
    from transformers import ConvNextConfig

    from mdhs_tpu.core.convert import convert_connext_full
    from mdhs_tpu.models.bert import BertConfig
    from mdhs_tpu.models.connext import ConNexTClassifier
    from mdhs_tpu.models.convnext import register_convnext_variant

    D = 48  # BERT hidden == fusion dim (reference: 768)
    hf_cfg = HFBertConfig(
        vocab_size=120, hidden_size=D, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96, max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    depths, dims = (2, 2, 2, 2), (16, 24, 32, 40)
    cnx_cfg = ConvNextConfig(depths=list(depths), hidden_sizes=list(dims))
    expert_layers = (D, 24, 16, 7)

    torch.manual_seed(5)
    tm = TorchOurClassifier(
        hf_cfg, cnx_cfg, num_labels=7, fusion_dim=D, head=head,
        expert_layers=expert_layers,
    ).eval()
    # Lightning nesting: Model4AAAI_MoE.net = BaseLineConvNeXt_KAN_mamba,
    # .net = OurClassfierConvnextV2 -> keys net.net.*
    wrapped = _LightningWrap(_LightningWrap(tm))

    rng = np.random.default_rng(5)
    B, S, L = 2, 64, 12
    img = rng.normal(size=(B, 3, S, S)).astype(np.float32)
    ids = rng.integers(0, 120, (B, L)).astype(np.int64)
    mask = np.ones((B, L), np.int64)
    mask[1, 8:] = 0
    with torch.no_grad():
        ref = tm(torch.tensor(img), torch.tensor(ids), torch.tensor(mask)).numpy()

    register_convnext_variant("parity_pico", depths, dims)
    params, stats, kan_state = convert_connext_full(
        to_np(wrapped.state_dict()), head=head,
        convnext_variant="parity_pico", num_bert_layers=2, moe_num_experts=4,
    )
    assert not stats

    bert = BertConfig(
        vocab_size=120, hidden_size=D, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96, max_position_embeddings=64,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    model = ConNexTClassifier(
        num_labels=7, convnext_variant="parity_pico", fusion_dim=D,
        head=head, moe_num_experts=4, moe_k=2,
        moe_expert_layers=expert_layers, bert=bert, dtype=jnp.float32,
    )
    # structural check: converted trees must exactly fill the init trees
    init_vars = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((B, S, S, 3), jnp.float32),
            jnp.zeros((B, L), jnp.int32),
            jnp.ones((B, L), jnp.int32),
        )
    )()
    import flax

    variables = {
        "params": flax.serialization.from_state_dict(
            init_vars["params"], as_jax(params)
        )
    }
    if head == "moe":
        variables["kan_state"] = flax.serialization.from_state_dict(
            init_vars["kan_state"], as_jax(kan_state)
        )

    logits, _balance = jax.jit(
        lambda v, i, t, m: model.apply(v, i, t, m)
    )(
        variables,
        jnp.asarray(np.transpose(img, (0, 2, 3, 1))),
        jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(mask.astype(np.int32)),
    )
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4, rtol=1e-3)
