"""Device-side ops (augment/TTA/stain norm) and metrics vs sklearn."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

KEY = jax.random.PRNGKey(0)


def test_eval_pipeline_matches_torchvision_semantics():
    from mdhs_tpu.ops.preprocess import eval_pipeline

    img = np.random.default_rng(0).integers(0, 255, (2, 72, 72, 3), np.uint8)
    out = np.asarray(eval_pipeline(jnp.asarray(img), 64, dtype=jnp.float32))
    assert out.shape == (2, 64, 64, 3)
    # normalized with ImageNet stats: channel means near zero-ish range
    crop = img[:, 4:68, 4:68, :].astype(np.float32) / 255.0
    ref = (crop - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_train_pipeline_shapes_and_range():
    from mdhs_tpu.ops.augment import train_pipeline

    img = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (4, 72, 72, 3), np.uint8)
    )
    out = train_pipeline(KEY, img, out_size=64, normalize=False)
    assert out.shape == (4, 64, 64, 3)
    o = np.asarray(out, np.float32)
    assert o.min() >= -1e-3 and o.max() <= 1.0 + 1e-3
    # different keys produce different crops
    out2 = train_pipeline(jax.random.PRNGKey(1), img, out_size=64, normalize=False)
    assert np.abs(o - np.asarray(out2, np.float32)).max() > 1e-3


def test_rotate_3shear_matches_gather_rotation():
    """The fast 3-shear rotation must agree with a direct bilinear-gather
    rotation on a smooth image (interior pixels; both interpolate a linear
    ramp near-exactly, differences are interpolation-order noise)."""
    from mdhs_tpu.ops.augment import affine_grid, _bilinear_sample, rotate_3shear

    O = 64
    rr, cc = np.meshgrid(np.arange(O), np.arange(O), indexing="ij")
    img = np.stack([rr + 0.5 * cc, cc - 0.25 * rr, rr * 0.0 + 3.0], -1).astype(np.float32)
    img /= img.max()
    imgs = jnp.asarray(img)[None]
    ang = 0.22  # radians

    out = np.asarray(rotate_3shear(imgs, jnp.asarray([ang]), max_degrees=45.0))[0]

    half = (O - 1) / 2.0
    c, s = np.cos(ang), np.sin(ang)
    m = jnp.asarray(
        [[c, -s, half - c * half + s * half], [s, c, half - s * half - c * half]],
        jnp.float32,
    )
    coords = affine_grid(m, O, O)
    ref = np.asarray(_bilinear_sample(imgs[0], coords))

    # compare away from the borders (fill behavior differs at corners)
    sl = slice(16, 48)
    d = np.abs(out[sl, sl] - ref[sl, sl])
    assert d.max() < 0.06, d.max()
    assert d.mean() < 0.01, d.mean()


def test_shear_kernel_bitexact_vs_slice_path(monkeypatch):
    """On TPU rotate_3shear runs the Pallas sublane-shift kernel
    (ops/shear.py); it must be BIT-exact against the dynamic-slice
    formulation (same lerp, same clipping) — not just close."""
    import mdhs_tpu.ops.shear as shear_mod
    from mdhs_tpu.ops import augment

    if not shear_mod.supports(jax.default_backend(), 64, 8, 8):
        pytest.skip("kernel path not enabled on this backend")

    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.random((4, 64, 64, 3)).astype(np.float32))
    angles = jnp.asarray(rng.uniform(-0.7, 0.7, (4,)).astype(np.float32))

    fast = np.asarray(augment.rotate_3shear(imgs, angles, max_degrees=45.0))
    monkeypatch.setattr(shear_mod, "supports", lambda *a: False)
    slow = np.asarray(augment.rotate_3shear(imgs, angles, max_degrees=45.0))
    np.testing.assert_array_equal(fast, slow)


def test_rotate_3shear_sign_convention():
    """+angle must rotate content the same direction as the gather path."""
    from mdhs_tpu.ops.augment import affine_grid, _bilinear_sample, rotate_3shear

    O = 64
    img = np.zeros((O, O, 1), np.float32)
    img[28:36, 44:52] = 1.0  # off-center blob
    imgs = jnp.asarray(img)[None]
    ang = 0.5
    out = np.asarray(rotate_3shear(imgs, jnp.asarray([ang]), 45.0))[0, ..., 0]

    half = (O - 1) / 2.0
    c, s = np.cos(ang), np.sin(ang)
    m = jnp.asarray(
        [[c, -s, half - c * half + s * half], [s, c, half - s * half - c * half]],
        jnp.float32,
    )
    ref = np.asarray(_bilinear_sample(imgs[0], affine_grid(m, O, O)))[..., 0]
    # centroids of the rotated blob must land in the same place
    def centroid(a):
        w = a.sum()
        ii, jj = np.meshgrid(np.arange(O), np.arange(O), indexing="ij")
        return (ii * a).sum() / w, (jj * a).sum() / w

    ci, cj = centroid(out)
    ri, rj = centroid(ref)
    assert abs(ci - ri) < 1.5 and abs(cj - rj) < 1.5, ((ci, cj), (ri, rj))


def test_tta_variants_geometry():
    from mdhs_tpu.ops.tta import tta_variants

    img = jnp.arange(2 * 4 * 4 * 1, dtype=jnp.float32).reshape(2, 4, 4, 1)
    v = tta_variants(img)
    assert v.shape == (4, 2, 4, 4, 1)
    np.testing.assert_array_equal(np.asarray(v[1]), np.asarray(img)[:, :, ::-1])
    np.testing.assert_array_equal(np.asarray(v[2]), np.asarray(img)[:, ::-1])
    # rot90 must match torch.rot90(k=1, dims=(-2,-1)) on the NCHW tensor
    # (reference _apply_tta, scripts/predict.py:33-42) — pin against torch
    # so the direction convention can't silently flip.
    import torch

    nchw = torch.from_numpy(np.asarray(img)).permute(0, 3, 1, 2)
    expected = torch.rot90(nchw, k=1, dims=(-2, -1)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(np.asarray(v[3]), expected)


def test_tta_fused_equals_looped():
    """Fused TTA must equal the reference's loop-and-average."""
    from mdhs_tpu.ops.tta import tta_logits, tta_variants

    W = np.random.default_rng(0).normal(size=(16, 3)).astype(np.float32)

    def apply_fn(images):
        return jnp.asarray(images.reshape(images.shape[0], -1) @ W)

    img = jnp.asarray(np.random.default_rng(1).normal(size=(2, 2, 2, 4)).astype(np.float32))
    fused = np.asarray(tta_logits(apply_fn, img))
    looped = np.mean([np.asarray(apply_fn(v)) for v in tta_variants(img)], axis=0)
    np.testing.assert_allclose(fused, looped, atol=1e-5)


def test_stain_normalize_moments():
    from mdhs_tpu.ops.stain_norm import rgb_to_lab_u8, stain_normalize

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0.2, 0.8, (2, 32, 32, 3)).astype(np.float32))
    tm = [150.0, 140.0, 140.0]
    ts = [20.0, 20.0, 20.0]
    out = stain_normalize(img, tm, ts)
    assert out.shape == img.shape
    lab = np.asarray(rgb_to_lab_u8(out))
    # moments moved toward the target (clipping makes it approximate)
    means = lab.reshape(2, -1, 3).mean(axis=1)
    assert np.all(np.abs(means - np.asarray(tm)) < 20.0)


def test_metrics_vs_sklearn():
    sk = pytest.importorskip("sklearn.metrics")
    from mdhs_tpu.train.metrics import classification_report

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(64, 5)).astype(np.float32)
    labels = rng.integers(0, 5, 64)
    rep = classification_report(jnp.asarray(logits), jnp.asarray(labels), 5)
    preds = logits.argmax(-1)

    assert abs(float(rep["accuracy"]) - sk.accuracy_score(labels, preds)) < 1e-6
    assert abs(
        float(rep["f1_macro"]) - sk.f1_score(labels, preds, average="macro")
    ) < 1e-5
    assert abs(
        float(rep["precision_macro"])
        - sk.precision_score(labels, preds, average="macro", zero_division=0)
    ) < 1e-5
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    ref_auc = sk.roc_auc_score(labels, probs, multi_class="ovr", average="macro")
    assert abs(float(rep["auroc_macro"]) - ref_auc) < 1e-3
    # torchmetrics Accuracy(task='multiclass') defaults to average='macro'
    # (mean per-class recall == sklearn balanced accuracy): the reference's
    # logged val_Accuracy (pl_model_MOE2.py:121) maps to accuracy_macro.
    assert abs(
        float(rep["accuracy_macro"]) - sk.balanced_accuracy_score(labels, preds)
    ) < 1e-6


def test_auroc_at_scale_with_ties():
    """Sort/segment-based AUROC must match sklearn at real-dataset scale
    (10k samples) including heavy ties (quantized probs)."""
    sk = pytest.importorskip("sklearn.metrics")
    from mdhs_tpu.train.metrics import auroc_ovr_macro

    rng = np.random.default_rng(1)
    n, k = 10000, 7
    logits = rng.normal(size=(n, k)).astype(np.float32)
    # quantize to force many exact ties
    logits = np.round(logits * 4) / 4
    labels = rng.integers(0, k, n)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    ref = sk.roc_auc_score(labels, probs, multi_class="ovr", average="macro")
    ours = float(auroc_ovr_macro(jnp.asarray(probs), jnp.asarray(labels), k))
    assert abs(ours - ref) < 1e-4, (ours, ref)


def test_kan_update_grid_preserves_function():
    import flax

    from mdhs_tpu.modules.kan import KANLinear, kan_update_grid

    m = KANLinear(8, 4, dtype=jnp.float32)
    x = jax.random.normal(KEY, (64, 8)) * 0.5
    v = jax.jit(lambda r, x: m.init(r, x))(KEY, x)
    y_before = m.apply(v, x)
    new_params, new_state = kan_update_grid(
        v["params"], v["kan_state"], x, layer_path="", grid_size=5, spline_order=3
    )
    # layer_path "" -> keys at root
    y_after = m.apply({"params": new_params, "kan_state": new_state}, x)
    np.testing.assert_allclose(
        np.asarray(y_before), np.asarray(y_after), atol=0.05, rtol=0.1
    )


def test_color_jitter_saturation_is_grayscale_blend():
    """torchvision F.adjust_saturation blends with the per-pixel grayscale
    (== data/augment_host._adjust_saturation), NOT an HSV S-multiply: for a
    pure-color pixel the max channel must move toward luma."""
    import jax

    from mdhs_tpu.ops.augment import color_jitter

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, size=(2, 8, 8, 3)).astype(np.float32))
    key = jax.random.PRNGKey(7)
    out = np.asarray(color_jitter(key, x, brightness=0, contrast=0,
                                  saturation=0.5, hue=0))
    # replicate the factor draw and the host-path blend
    _, _, ks, _ = jax.random.split(key, 4)
    fs = np.asarray(jax.random.uniform(ks, (2, 1, 1, 1), minval=0.5, maxval=1.5))
    lum = np.array([0.299, 0.587, 0.114], np.float32)
    gray = (np.asarray(x) @ lum)[..., None]
    want = np.clip((np.asarray(x) - gray) * fs + gray, 0, 1)
    np.testing.assert_allclose(out, want, atol=2e-5)

    # distinguishing case vs HSV S-multiply: pure red at factor != 1 must
    # change its max channel (HSV keeps V fixed)
    red = jnp.zeros((1, 4, 4, 3)).at[..., 0].set(1.0)
    out_red = np.asarray(color_jitter(key, red, brightness=0, contrast=0,
                                      saturation=0.5, hue=0))
    assert abs(out_red[..., 0].max() - 1.0) > 0.05
