"""Loss zoo.

Parity targets:
- CE + label smoothing (default 0.02) and "balanced" class weights
  (reference scripts/train.py:238-254, _compute_class_weights :63-71)
- FocalLoss gamma=2 (reference scripts/train.py:46-61)
- SupConLoss supervised contrastive, temperature 0.07
  (reference scripts/train.py:23-44)
- MP-Loss: symmetric-KL-weighted multi-part CE for MIBF-Net
  (reference mibf_net/model_resnet.py:65-94, attention.py:25-28)
- textimage / text_image_textimage alternative MIBF objectives
- MoE balance loss lives in modules/moe.py (cv^2)

All losses compute in float32 regardless of model compute dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.registry import LOSSES


def one_hot(labels, num_classes):
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


def compute_class_weights(labels, num_classes: int) -> np.ndarray:
    """total / (count * num_classes), counts clamped to >=1
    (reference scripts/train.py:63-71)."""
    counts = np.zeros(num_classes, dtype=np.float64)
    for l in np.asarray(labels):
        if 0 <= int(l) < num_classes:
            counts[int(l)] += 1
    total = max(counts.sum(), 1.0)
    return (total / (np.maximum(counts, 1.0) * num_classes)).astype(np.float32)


def masked_mean(per_sample, sample_mask):
    """Mean over the rows where sample_mask == 1 (static-shape equivalent of
    torch's mean over a short tail batch, see DataLoader padding)."""
    if sample_mask is None:
        return per_sample.mean()
    m = sample_mask.astype(jnp.float32)
    return (per_sample * m).sum() / jnp.maximum(m.sum(), 1.0)


def cross_entropy(
    logits,
    labels,
    *,
    label_smoothing: float = 0.0,
    class_weights: Optional[jnp.ndarray] = None,
    reduction: str = "mean",
    sample_mask: Optional[jnp.ndarray] = None,
):
    """torch.nn.CrossEntropyLoss semantics, including its weighted-mean
    normalization (sum of per-sample weights, not batch size).

    sample_mask (0/1 per row) excludes the DataLoader's padded tail rows so
    a short last batch trains/evaluates on its true samples only — the
    static-shape equivalent of torch's drop_last=False small batch."""
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    targets = one_hot(labels, num_classes)
    if label_smoothing > 0:
        targets = targets * (1.0 - label_smoothing) + label_smoothing / num_classes
    per_sample = -(targets * logp).sum(axis=-1)
    if class_weights is not None:
        w = class_weights[labels]
        if sample_mask is not None:
            w = w * sample_mask.astype(jnp.float32)
        per_sample = per_sample * w
        if reduction == "mean":
            return per_sample.sum() / jnp.maximum(w.sum(), 1e-8)
    elif sample_mask is not None:
        if reduction == "mean":
            return masked_mean(per_sample, sample_mask)
        per_sample = per_sample * sample_mask.astype(jnp.float32)
    if reduction == "mean":
        return per_sample.mean()
    if reduction == "sum":
        return per_sample.sum()
    return per_sample


@LOSSES.register("ce")
def ce_loss(logits, labels, *, label_smoothing=0.02, class_weights=None,
            sample_mask=None, **_):
    return cross_entropy(
        logits, labels, label_smoothing=label_smoothing,
        class_weights=class_weights, sample_mask=sample_mask,
    )


@LOSSES.register("focal")
def focal_loss(logits, labels, *, gamma: float = 2.0, class_weights=None,
               sample_mask=None, **_):
    """((1 - p_t)^gamma) * CE (reference scripts/train.py:46-61; pt derived
    from the weighted CE as exp(-ce), matching torch's composition)."""
    ce = cross_entropy(logits, labels, class_weights=class_weights, reduction="none")
    pt = jnp.exp(-ce)
    return masked_mean(((1.0 - pt) ** gamma) * ce, sample_mask)


def supcon_loss(features, labels, temperature: float = 0.07, sample_mask=None):
    """Supervised contrastive loss (reference scripts/train.py:23-44).

    sample_mask removes padded tail rows from both the positive mask and
    the denominator (a padded duplicate would otherwise act as a spurious
    same-class positive for its source row)."""
    f = features.astype(jnp.float32)
    f = f / (jnp.linalg.norm(f, axis=1, keepdims=True) + 1e-12)
    logits = f @ f.T / temperature
    logits = logits - jax.lax.stop_gradient(logits.max(axis=1, keepdims=True))

    labels = labels.reshape(-1, 1)
    mask = (labels == labels.T).astype(jnp.float32)
    eye = jnp.eye(logits.shape[0], dtype=jnp.float32)
    mask = mask * (1.0 - eye)
    valid = (
        jnp.ones(logits.shape[0], jnp.float32)
        if sample_mask is None
        else sample_mask.astype(jnp.float32)
    )
    pair_valid = valid[:, None] * valid[None, :]
    mask = mask * pair_valid

    exp_logits = jnp.exp(logits) * (1.0 - eye) * pair_valid
    log_prob = logits - jnp.log(exp_logits.sum(axis=1, keepdims=True) + 1e-8)
    mean_log_prob_pos = (mask * log_prob).sum(axis=1) / (mask.sum(axis=1) + 1e-8)
    return -(mean_log_prob_pos * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def kl_divergence(p, q, eps: float = 1e-8):
    """sum p (log p - log q) with clamping (reference mibf_net/attention.py:25-28)."""
    p = jnp.clip(p.astype(jnp.float32), eps, 1.0)
    q = jnp.clip(q.astype(jnp.float32), eps, 1.0)
    return jnp.sum(p * (jnp.log(p) - jnp.log(q)), axis=-1)


def mp_loss(outputs: dict, labels, sample_mask=None):
    """MIBF MP-Loss (reference mibf_net/model_resnet.py:76-94):
    0.3*CE_img + 0.6*CE_txt + 1.1*mean(exp(symKL) * CE_joint)."""
    image_logits = outputs["image"].astype(jnp.float32)
    text_logits = outputs["text"].astype(jnp.float32)
    joint_logits = outputs["image_text"].astype(jnp.float32)
    p_img = jax.nn.softmax(image_logits, axis=-1)
    p_txt = jax.nn.softmax(text_logits, axis=-1)
    kl = 0.5 * (kl_divergence(p_img, p_txt) + kl_divergence(p_txt, p_img))
    kl = jnp.nan_to_num(kl, nan=0.0, posinf=10.0, neginf=0.0)
    kl = jnp.clip(kl, 0.0, 10.0)
    image_loss = cross_entropy(image_logits, labels, sample_mask=sample_mask)
    text_loss = cross_entropy(text_logits, labels, sample_mask=sample_mask)
    # scalar, like reference
    joint_loss = cross_entropy(joint_logits, labels, sample_mask=sample_mask)
    weighted_joint = masked_mean(jnp.exp(kl) * joint_loss, sample_mask)
    return 0.3 * image_loss + 0.6 * text_loss + 1.1 * weighted_joint


def mibf_loss(outputs: dict, labels, loss_class: str = "KL_loss", sample_mask=None):
    """Loss-mode dispatch (reference mibf_net/model_resnet.py:65-74)."""
    if loss_class == "textimage_loss":
        return cross_entropy(outputs["image_text"], labels, sample_mask=sample_mask)
    if loss_class == "text_image_textimage_loss":
        return (
            cross_entropy(outputs["image"], labels, sample_mask=sample_mask)
            + cross_entropy(outputs["text"], labels, sample_mask=sample_mask)
            + cross_entropy(outputs["image_text"], labels, sample_mask=sample_mask)
        )
    return mp_loss(outputs, labels, sample_mask=sample_mask)
