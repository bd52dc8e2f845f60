"""One-step TRAINING differential vs torch: same converted weights, same
batch, same optimizer step in both frameworks.

Certifies the semantics eval-mode logit parity cannot: loss values
(CE+smoothing, MP-Loss), gradients through the full model (per-tower
cosine), train-mode BatchNorm (batch stats + torch's unbiased running-var
update, models/norm.py), and the optimizer update itself (optax adam/sgd
vs torch.optim). Reference hot loops: scripts/train.py:349-387,
mibf_net/train_resnet.py:28-34.

The torch twins come from test_full_model_parity (public torch/HF modules
with reference naming); the converter is run on the torch *gradients* dict
too, which maps them into our tree layout for leafwise comparison.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from test_full_model_parity import (  # noqa: E402
    TorchBaseline,
    TorchMIBF,
    as_jax,
    perturb_batchnorms,
    to_np,
)


def torch_grad_sd(model):
    """state_dict-shaped gradients (zeros for params without grads and for
    buffers, so the weight converters can consume it)."""
    sd = {}
    for k, p in model.named_parameters():
        g = p.grad if p.grad is not None else torch.zeros_like(p)
        sd[k] = g.detach().numpy()
    for k, b in model.named_buffers():
        sd[k] = torch.zeros_like(b).detach().numpy()
    return sd


def flat_cos(a_tree, b_tree):
    av = np.concatenate(
        [np.asarray(x, np.float64).ravel() for x in jax.tree_util.tree_leaves(a_tree)]
    )
    bv = np.concatenate(
        [np.asarray(x, np.float64).ravel() for x in jax.tree_util.tree_leaves(b_tree)]
    )
    assert av.shape == bv.shape
    return float(av @ bv / (np.linalg.norm(av) * np.linalg.norm(bv) + 1e-30))


def tree_max_delta(a, b):
    return max(
        float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


def _batch(seed, B, S, L, vocab, num_classes):
    rng = np.random.default_rng(seed)
    img = rng.normal(size=(B, 3, S, S)).astype(np.float32)
    ids = rng.integers(0, vocab, (B, L)).astype(np.int64)
    mask = np.ones((B, L), np.int64)
    mask[1, L // 2 :] = 0
    labels = rng.integers(0, num_classes, (B,)).astype(np.int64)
    return img, ids, mask, labels


def test_optimizer_update_matches_torch():
    """optax adam / sgd+momentum vs torch.optim over 3 steps on synthetic
    well-scaled gradients (reference optimizers: scripts/train.py:255-309).

    Model-level step tests below use SGD because first-step Adam is
    sign-like (g/(|g|+eps)) and amplifies fp-noise-level gradients to
    full-lr update differences; this isolated differential pins the Adam
    math itself (bias correction, eps placement) exactly.
    """
    rng = np.random.default_rng(7)
    p0 = rng.normal(size=(5, 4)).astype(np.float32)
    grads = [rng.normal(size=(5, 4)).astype(np.float32) for _ in range(3)]

    for name, make_t, make_j in [
        ("adam",
         lambda p: torch.optim.Adam([p], lr=1e-3),
         lambda: optax.adam(1e-3)),
        ("sgd_momentum",
         lambda p: torch.optim.SGD([p], lr=0.1, momentum=0.9),
         lambda: optax.sgd(0.1, momentum=0.9)),
    ]:
        tp = torch.tensor(p0.copy(), requires_grad=True)
        topt = make_t(tp)
        for g in grads:
            tp.grad = torch.tensor(g)
            topt.step()

        tx = make_j()
        jp = jnp.asarray(p0)
        state = tx.init(jp)
        for g in grads:
            updates, state = tx.update(jnp.asarray(g), state, jp)
            jp = optax.apply_updates(jp, updates)
        np.testing.assert_allclose(
            np.asarray(jp), tp.detach().numpy(), atol=1e-6, err_msg=name
        )


def test_baseline_train_step_parity():
    """CE+label-smoothing(0.02) + one SGD step (reference
    scripts/train.py:238-254, 349-387)."""
    from transformers import BertConfig as HFBertConfig

    from mdhs_tpu.core.convert import convert_baseline_full
    from mdhs_tpu.models.baseline import BaselineConfig, MultimodalBaselineModel
    from mdhs_tpu.models.bert import BertConfig
    from mdhs_tpu.train.losses import ce_loss

    hf_cfg = HFBertConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(3)
    tm = TorchBaseline(hf_cfg, "concat")
    perturb_batchnorms(tm, seed=13)
    tm.train()

    B, S, L = 4, 64, 10
    img, ids, mask, labels = _batch(3, B, S, L, 100, 7)
    t_img, t_ids, t_mask = torch.tensor(img), torch.tensor(ids), torch.tensor(mask)
    t_labels = torch.tensor(labels)

    params, stats = convert_baseline_full(
        to_np(tm.state_dict()), fusion_type="concat", classifier_type="mlp",
        backbone="resnet18", num_bert_layers=2,
    )
    params, stats = as_jax(params), as_jax(stats)

    # ---- torch step
    opt = torch.optim.SGD(tm.parameters(), lr=0.05)
    logits_t = tm(t_img, t_ids, t_mask)
    crit = tnn.CrossEntropyLoss(label_smoothing=0.02)
    loss_t = crit(logits_t, t_labels)
    loss_t.backward()
    grads_t, _ = convert_baseline_full(
        torch_grad_sd(tm), fusion_type="concat", classifier_type="mlp",
        backbone="resnet18", num_bert_layers=2,
    )
    opt.step()

    # ---- our step
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
    j_labels = jnp.asarray(labels.astype(np.int32))

    def loss_fn(p, bs):
        logits, new_vars = model.apply(
            {"params": p, "batch_stats": bs}, j_img, j_ids, j_mask,
            train=True, mutable=["batch_stats"],
        )
        return ce_loss(logits, j_labels, label_smoothing=0.02), (new_vars, logits)

    @jax.jit
    def step(p, bs):
        (loss, (new_vars, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(p, bs)
        tx = optax.sgd(0.05)
        updates, _ = tx.update(grads, tx.init(p), p)
        return loss, logits, grads, optax.apply_updates(p, updates), new_vars

    loss_j, logits_j, grads_j, new_params, new_vars = step(params, stats)

    # 1. loss
    np.testing.assert_allclose(float(loss_j), float(loss_t), atol=1e-4)
    # 2. pre-step train-mode logits
    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t.detach().numpy(), atol=2e-4, rtol=1e-3
    )
    # 3. per-tower gradient cosine
    for tower in ("image_encoder", "text_encoder", "fusion", "classifier"):
        c = flat_cos(grads_j[tower], grads_t[tower])
        assert c >= 0.999, f"{tower} grad cosine {c}"
    # 4. BN running stats after one train forward (incl. torch's unbiased
    #    running_var update)
    tm_sd = to_np(tm.state_dict())
    new_bs = new_vars["batch_stats"]
    np.testing.assert_allclose(
        np.asarray(new_bs["image_encoder"]["trunk"]["stem_bn"]["mean"]),
        tm_sd["image_encoder.model.bn1.running_mean"], atol=1e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(new_bs["image_encoder"]["trunk"]["stem_bn"]["var"]),
        tm_sd["image_encoder.model.bn1.running_var"], atol=1e-5, rtol=1e-4,
    )
    # 5. post-step parameter + eval-logit drift
    post_params, _ = convert_baseline_full(
        tm_sd, fusion_type="concat", classifier_type="mlp",
        backbone="resnet18", num_bert_layers=2,
    )
    assert tree_max_delta(new_params, as_jax(post_params)) < 5e-6
    tm.eval()
    with torch.no_grad():
        post_t = tm(t_img, t_ids, t_mask).numpy()
    post_j = model.apply(
        {"params": new_params, "batch_stats": new_bs}, j_img, j_ids, j_mask
    )
    np.testing.assert_allclose(np.asarray(post_j), post_t, atol=5e-4, rtol=1e-3)


def test_mibf_train_step_parity():
    """MP-Loss (0.3/0.6/1.1 exp(symKL)-weighted CE, mibf_net
    model_resnet.py:76-94) + one plain-SGD step (train_resnet.py:28-34)."""
    from transformers import BertConfig as HFBertConfig

    from mdhs_tpu.core.convert import convert_mibf_full
    from mdhs_tpu.models.bert import BertConfig
    from mdhs_tpu.models.mibf import MIBFNet
    from mdhs_tpu.train.losses import mibf_loss

    hf_cfg = HFBertConfig(
        vocab_size=128, hidden_size=768, num_hidden_layers=1,
        num_attention_heads=12, intermediate_size=128,
        max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(4)
    tm = TorchMIBF(num_labels=6, hf_cfg=hf_cfg)
    perturb_batchnorms(tm, seed=17)
    tm.train()

    B, S, L = 4, 64, 12
    img, ids, mask, labels = _batch(4, B, S, L, 128, 6)
    t_img, t_ids, t_mask = torch.tensor(img), torch.tensor(ids), torch.tensor(mask)
    t_labels = torch.tensor(labels)

    params, stats = convert_mibf_full(to_np(tm.state_dict()), num_bert_layers=1)
    params, stats = as_jax(params), as_jax(stats)

    # ---- torch step: the reference's compute_kl_loss
    def torch_mp_loss(out, y):
        ce = tnn.CrossEntropyLoss()
        p_img = torch.softmax(out["image"], -1)
        p_txt = torch.softmax(out["text"], -1)

        def kld(p, q, eps=1e-8):
            p = p.clamp(min=eps, max=1.0)
            q = q.clamp(min=eps, max=1.0)
            return (p * (p.log() - q.log())).sum(-1)

        kl = 0.5 * (kld(p_img, p_txt) + kld(p_txt, p_img))
        kl = torch.nan_to_num(kl, nan=0.0, posinf=10.0).clamp(0.0, 10.0)
        return (
            0.3 * ce(out["image"], y)
            + 0.6 * ce(out["text"], y)
            + 1.1 * (torch.exp(kl) * ce(out["image_text"], y)).mean()
        )

    opt = torch.optim.SGD(tm.parameters(), lr=0.05)
    out_t = tm(t_img, t_ids, t_mask)
    loss_t = torch_mp_loss(out_t, t_labels)
    loss_t.backward()
    grads_t, _ = convert_mibf_full(torch_grad_sd(tm), num_bert_layers=1)
    opt.step()

    # ---- our step
    bert = BertConfig(
        vocab_size=128, hidden_size=768, num_hidden_layers=1,
        num_attention_heads=12, intermediate_size=128,
        max_position_embeddings=64, hidden_dropout=0.0, attention_dropout=0.0,
    )
    model = MIBFNet(num_labels=6, bert=bert, dtype=jnp.float32)
    j_img = jnp.asarray(np.transpose(img, (0, 2, 3, 1)))
    j_ids = jnp.asarray(ids.astype(np.int32))
    j_mask = jnp.asarray(mask.astype(np.int32))
    j_labels = jnp.asarray(labels.astype(np.int32))

    def loss_fn(p, bs):
        out, new_vars = model.apply(
            {"params": p, "batch_stats": bs}, j_img, j_ids, j_mask,
            train=True, mutable=["batch_stats"],
        )
        return mibf_loss(out, j_labels, "KL_loss"), (new_vars, out)

    @jax.jit
    def step(p, bs):
        (loss, (new_vars, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(p, bs)
        updates, _ = optax.sgd(0.05).update(grads, optax.sgd(0.05).init(p), p)
        return loss, out, grads, optax.apply_updates(p, updates), new_vars

    loss_j, out_j, grads_j, new_params, new_vars = step(params, stats)

    np.testing.assert_allclose(float(loss_j), float(loss_t), atol=1e-4, rtol=1e-5)
    for key in ("image_text", "text", "image"):
        np.testing.assert_allclose(
            np.asarray(out_j[key]), out_t[key].detach().numpy(),
            atol=3e-4, rtol=1e-3, err_msg=key,
        )
    for tower in ("image_encoder", "text_encoder",
                  "textbased_cross_attention", "imagbased_cross_attention"):
        c = flat_cos(grads_j[tower], grads_t[tower])
        assert c >= 0.999, f"{tower} grad cosine {c}"

    tm_sd = to_np(tm.state_dict())
    new_bs = new_vars["batch_stats"]
    np.testing.assert_allclose(
        np.asarray(new_bs["image_encoder"]["trunk"]["stem_bn"]["var"]),
        tm_sd["image_encoder.bn1.running_var"], atol=1e-5, rtol=1e-4,
    )
    # Post-step drift. Exact param equality is unattainable for ResNet50:
    # BN centers pre-activations at zero, so fp-noise-level forward
    # differences (~1e-6 on CPU) flip individual ReLU masks, which is a
    # DISCRETE backward difference. Measured floor (identical semantics,
    # plain sum-loss, CPU f32 vs torch): max elementwise grad delta ~1-2%
    # of the tower's max|g| at cosine 0.9999 — the same noise appears
    # torch-vs-torch under algorithm changes. The semantic asserts are the
    # cosines above + the loss/logit checks; here we bound the step drift
    # relative to the update scale (lr * max|g| ~ 0.4) and pin post-step
    # eval logits, the observable the reference training loop cares about.
    post_params, _ = convert_mibf_full(tm_sd, num_bert_layers=1)
    gmax = max(
        float(np.max(np.abs(np.asarray(g))))
        for g in jax.tree_util.tree_leaves(grads_j)
    )
    assert tree_max_delta(new_params, as_jax(post_params)) < 0.03 * 0.05 * gmax
    tm.eval()
    with torch.no_grad():
        post_t = tm(t_img, t_ids, t_mask)
    post_j = model.apply(
        {"params": new_params, "batch_stats": new_bs}, j_img, j_ids, j_mask
    )
    for key in ("image_text", "text", "image"):
        np.testing.assert_allclose(
            np.asarray(post_j[key]), post_t[key].numpy(),
            atol=5e-3, rtol=1e-2, err_msg=f"post-step {key}",
        )


def test_connext_train_step_parity():
    """ConNexT family: plain CE (reference pl_model_MOE2.py:100-108, no
    smoothing) + one SGD step through the bidirectional conv cross-attention
    classifier (ourmodel.py:69-95). Adam itself is pinned by
    test_optimizer_update_matches_torch; SGD isolates the model/loss
    gradients from Adam's sign-like first step."""
    import flax
    from transformers import BertConfig as HFBertConfig
    from transformers import ConvNextConfig

    from test_full_model_parity import TorchOurClassifier

    from mdhs_tpu.core.convert import convert_connext_full
    from mdhs_tpu.models.bert import BertConfig
    from mdhs_tpu.models.connext import ConNexTClassifier
    from mdhs_tpu.models.convnext import register_convnext_variant
    from mdhs_tpu.train.losses import ce_loss

    D = 48
    hf_cfg = HFBertConfig(
        vocab_size=120, hidden_size=D, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96, max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    depths, dims = (2, 2, 2, 2), (16, 24, 32, 40)
    cnx_cfg = ConvNextConfig(depths=list(depths), hidden_sizes=list(dims))

    torch.manual_seed(6)
    tm = TorchOurClassifier(hf_cfg, cnx_cfg, num_labels=7, fusion_dim=D)
    tm.train()

    B, S, L = 4, 64, 12
    img, ids, mask, labels = _batch(6, B, S, L, 120, 7)
    t_img, t_ids, t_mask = torch.tensor(img), torch.tensor(ids), torch.tensor(mask)
    t_labels = torch.tensor(labels)

    register_convnext_variant("parity_pico_train", depths, dims)
    params, stats, kan_state = convert_connext_full(
        to_np(tm.state_dict()), head="linear",
        convnext_variant="parity_pico_train", num_bert_layers=2,
    )
    assert not stats and not kan_state
    # copy out of torch storage NOW: to_np returns views and opt.step()
    # below mutates the parameters in place
    params = as_jax(params)

    # ---- torch step
    opt = torch.optim.SGD(tm.parameters(), lr=0.05)
    logits_t = tm(t_img, t_ids, t_mask)
    loss_t = tnn.CrossEntropyLoss()(logits_t, t_labels)
    loss_t.backward()
    grads_t, _, _ = convert_connext_full(
        torch_grad_sd(tm), head="linear",
        convnext_variant="parity_pico_train", num_bert_layers=2,
    )
    opt.step()

    # ---- our step
    bert = BertConfig(
        vocab_size=120, hidden_size=D, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96, max_position_embeddings=64,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    model = ConNexTClassifier(
        num_labels=7, convnext_variant="parity_pico_train", fusion_dim=D,
        bert=bert, dtype=jnp.float32,
    )
    j_img = jnp.asarray(np.transpose(img, (0, 2, 3, 1)))
    j_ids = jnp.asarray(ids.astype(np.int32))
    j_mask = jnp.asarray(mask.astype(np.int32))
    j_labels = jnp.asarray(labels.astype(np.int32))

    init_params = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, j_img, j_ids, j_mask
        )
    )()["params"]
    params = flax.serialization.from_state_dict(init_params, params)
    grads_ref = flax.serialization.from_state_dict(init_params, as_jax(grads_t))

    def loss_fn(p):
        logits, _balance = model.apply({"params": p}, j_img, j_ids, j_mask, train=True)
        return ce_loss(logits, j_labels, label_smoothing=0.0), logits

    @jax.jit
    def step(p):
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, _ = optax.sgd(0.05).update(grads, optax.sgd(0.05).init(p), p)
        return loss, logits, grads, optax.apply_updates(p, updates)

    loss_j, logits_j, grads_j, new_params = step(params)

    # 1. loss + pre-step train-mode logits
    np.testing.assert_allclose(float(loss_j), float(loss_t), atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t.detach().numpy(), atol=2e-4, rtol=1e-3
    )
    # 2. per-tower gradient cosine
    for tower in ("image_encoder", "text_encoder", "reduce_conv",
                  "textbased_cross_attention", "imagbased_cross_attention", "fc"):
        c = flat_cos(grads_j[tower], grads_ref[tower])
        assert c >= 0.999, f"{tower} grad cosine {c}"
    # 3. post-step params + eval logits (no BN in ConvNeXt -> tight bound)
    post_params, _, _ = convert_connext_full(
        to_np(tm.state_dict()), head="linear",
        convnext_variant="parity_pico_train", num_bert_layers=2,
    )
    post_params = flax.serialization.from_state_dict(init_params, as_jax(post_params))
    assert tree_max_delta(new_params, post_params) < 5e-6
    tm.eval()
    with torch.no_grad():
        post_t = tm(t_img, t_ids, t_mask).numpy()
    post_j, _ = model.apply({"params": new_params}, j_img, j_ids, j_mask)
    np.testing.assert_allclose(np.asarray(post_j), post_t, atol=5e-4, rtol=1e-3)
