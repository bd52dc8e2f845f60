"""Differential tests for the analysis math (Grad-CAM, feature rank).

The torch twin replicates the reference's hook-based GradCAM pipeline
exactly (analysis_tools.py:29-120: forward/backward hooks, one-hot
backward, GAP weights, ReLU, divide-by-max per layer, bilinear resize,
average, re-normalize) on the converted baseline model, pinning our
functional nn.perturb implementation layer by layer.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_full_model_parity import TorchBaseline, as_jax, perturb_batchnorms, to_np  # noqa: E402

LAYERS = ("stem", "layer1", "layer2", "layer3", "layer4")


def torch_gradcam(tm, img, ids, mask, image_size):
    """Reference GradCAM (analysis_tools.py:44-120) with hooks; resize via
    bilinear interpolate (== cv2.INTER_LINEAR on float inputs)."""
    m = tm.image_encoder.model
    mods = {"stem": m.maxpool, "layer1": m.layer1, "layer2": m.layer2,
            "layer3": m.layer3, "layer4": m.layer4}
    acts, grads = {}, {}
    handles = []
    for name, mod in mods.items():
        handles.append(mod.register_forward_hook(
            lambda _m, _i, o, name=name: acts.__setitem__(name, o)))
        handles.append(mod.register_full_backward_hook(
            lambda _m, _gi, go, name=name: grads.__setitem__(name, go[0])))
    tm.zero_grad()
    logits = tm(img, ids, mask)
    target = logits.argmax(dim=1)
    one_hot = torch.zeros_like(logits)
    for i in range(logits.size(0)):
        one_hot[i][target[i]] = 1
    logits.backward(gradient=one_hot, retain_graph=True)
    for h in handles:
        h.remove()

    B = img.shape[0]
    layer_cams = {}
    for name in LAYERS:
        g = grads[name].detach().numpy()  # (B, C, H, W)
        a = acts[name].detach().numpy()
        w = g.mean(axis=(2, 3))  # (B, C)
        cam = np.maximum((w[:, :, None, None] * a).sum(axis=1), 0)
        for i in range(B):
            if cam[i].max() > 0:
                cam[i] = cam[i] / cam[i].max()
        cam = F.interpolate(
            torch.tensor(cam[:, None]), size=(image_size, image_size),
            mode="bilinear", align_corners=False,
        )[:, 0].numpy()
        layer_cams[name] = cam
    avg = np.mean([layer_cams[n] for n in LAYERS], axis=0)
    for i in range(B):
        if avg[i].max() > 0:
            avg[i] = avg[i] / avg[i].max()
    return avg, layer_cams, logits.detach().numpy()


def test_gradcam_differential():
    from transformers import BertConfig as HFBertConfig

    from mdhs_tpu.analysis.gradcam import gradcam
    from mdhs_tpu.core.convert import convert_baseline_full
    from mdhs_tpu.models.baseline import BaselineConfig, MultimodalBaselineModel
    from mdhs_tpu.models.bert import BertConfig

    hf_cfg = HFBertConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(6)
    tm = TorchBaseline(hf_cfg, "concat").eval()
    perturb_batchnorms(tm, seed=21)

    rng = np.random.default_rng(6)
    B, S, L = 2, 64, 10
    img = rng.normal(size=(B, 3, S, S)).astype(np.float32)
    ids = rng.integers(0, 100, (B, L)).astype(np.int64)
    mask = np.ones((B, L), np.int64)

    ref_avg, ref_layers, ref_logits = torch_gradcam(
        tm, torch.tensor(img, requires_grad=True), torch.tensor(ids),
        torch.tensor(mask), S,
    )

    params, stats = convert_baseline_full(
        to_np(tm.state_dict()), fusion_type="concat", classifier_type="mlp",
        backbone="resnet18", num_bert_layers=2,
    )
    bert = BertConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    cfg = BaselineConfig(
        num_classes=7, hidden_dim=64, text_feature_dim=32, dropout=0.0,
        image_backbone="resnet18", fusion_type="concat",
        classifier_type="mlp", bert=bert,
    )
    model = MultimodalBaselineModel(cfg, dtype=jnp.float32)

    j_img = jnp.asarray(np.transpose(img, (0, 2, 3, 1)))
    j_ids = jnp.asarray(ids.astype(np.int32))
    j_mask = jnp.asarray(mask.astype(np.int32))
    shapes = jax.eval_shape(
        lambda r: model.init(
            {"params": r}, j_img, j_ids, j_mask, method=model.logits_and_taps
        ),
        jax.random.PRNGKey(0),
    )
    perts = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.float32), shapes["perturbations"]
    )

    def fwd(v):
        return model.apply(v, j_img, j_ids, j_mask, method=model.logits_and_taps)

    avg, logits, layer_cams = gradcam(
        fwd,
        {"params": as_jax(params), "batch_stats": as_jax(stats),
         "perturbations": perts},
        image_size=S, return_layer_cams=True,
    )
    np.testing.assert_allclose(logits, ref_logits, atol=2e-4, rtol=1e-3)
    for name in LAYERS:
        np.testing.assert_allclose(
            layer_cams[name], ref_layers[name], atol=1e-3, err_msg=name
        )
    np.testing.assert_allclose(avg, ref_avg, atol=1e-3)


def test_feature_rank_differential():
    """Centering + SVD + max-normalization vs the torch formulation
    (analysis_tools.py:160-180)."""
    from mdhs_tpu.analysis.feature_rank import FeatureRankAnalyzer

    rng = np.random.default_rng(8)
    # low-rank-ish features: rank-4 structure + noise
    feats = (rng.normal(size=(64, 4)) @ rng.normal(size=(4, 32))
             + 0.01 * rng.normal(size=(64, 32))).astype(np.float32)

    t = torch.tensor(feats)
    t = t - t.mean(dim=0, keepdim=True)
    s_ref = torch.linalg.svd(t).S.numpy()
    s_ref_norm = s_ref / s_ref.max()

    fr = FeatureRankAnalyzer()
    fr.add(feats[:40])
    fr.add(feats[40:])
    res = fr.compute()
    np.testing.assert_allclose(res["normalized"], s_ref_norm, atol=1e-4)
    assert 3.0 < res["effective_rank"] < 6.0
