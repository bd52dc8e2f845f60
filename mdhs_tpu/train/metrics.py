"""Device-side classification metrics.

Replaces torchmetrics/sklearn usage in the reference (pl_model_MOE2.py:120-135
macro + per-class Accuracy/Precision/Recall/F1 + AUROC; models/test.py:118-131
sklearn reports; predict_resnet_ham_image.py:101-116 macro-OVR AUC).

All metrics are computed from a confusion matrix / rank statistics in jnp so
they can run inside jitted eval loops; macro averages over classes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def confusion_matrix(preds, labels, num_classes: int) -> jnp.ndarray:
    """(num_classes, num_classes) matrix; rows = true, cols = predicted."""
    idx = labels * num_classes + preds
    cm = jnp.bincount(idx.reshape(-1), length=num_classes * num_classes)
    return cm.reshape(num_classes, num_classes).astype(jnp.float32)


def accuracy(preds, labels) -> jnp.ndarray:
    return (preds == labels).mean()


def per_class_metrics(cm: jnp.ndarray):
    """Returns dict of per-class vectors: accuracy (recall), precision,
    recall, f1. Classes absent from the batch get 0 (torchmetrics default)."""
    tp = jnp.diag(cm)
    support = cm.sum(axis=1)
    predicted = cm.sum(axis=0)
    precision = jnp.where(predicted > 0, tp / jnp.maximum(predicted, 1.0), 0.0)
    recall = jnp.where(support > 0, tp / jnp.maximum(support, 1.0), 0.0)
    f1 = jnp.where(
        precision + recall > 0, 2 * precision * recall / jnp.maximum(precision + recall, 1e-12), 0.0
    )
    return {"accuracy": recall, "precision": precision, "recall": recall, "f1": f1}


def macro_metrics(cm: jnp.ndarray):
    """Macro metric dict.

    `accuracy` is micro (correct/total), matching the reference's
    training_step accuracy (`(pred.argmax == labels).mean()`,
    pl_model_MOE2.py:149 and scripts/train.py). `accuracy_macro` is mean
    per-class recall: torchmetrics `Accuracy(task="multiclass", ...)` with
    no `average` arg defaults to average="macro", so the reference's logged
    val_Accuracy (pl_model_MOE2.py:121) is THIS number, not micro accuracy —
    on the imbalanced HAM split they differ by ~10+ points.
    """
    per = per_class_metrics(cm)
    total = cm.sum()
    return {
        "accuracy": jnp.diag(cm).sum() / jnp.maximum(total, 1.0),
        "accuracy_macro": per["recall"].mean(),
        "precision_macro": per["precision"].mean(),
        "recall_macro": per["recall"].mean(),
        "f1_macro": per["f1"].mean(),
    }


def auroc_ovr_macro(probs, labels, num_classes: int) -> jnp.ndarray:
    """Macro one-vs-rest AUROC via the rank-sum (Mann-Whitney U) statistic.

    AUC_c = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg) where R_pos is the
    sum of ranks of positive-class scores. Ties get average ranks, computed
    with a sort + segment-sum (O(N log N), no N x N tie matrix — the HAM
    test split is thousands of samples and this runs every epoch).
    """
    probs = probs.astype(jnp.float32)
    n = probs.shape[0]

    def one_class(c):
        scores = probs[:, c]
        pos = (labels == c).astype(jnp.float32)
        n_pos = pos.sum()
        n_neg = n - n_pos
        order = jnp.argsort(scores)
        s = scores[order]
        base = jnp.arange(1, n + 1, dtype=jnp.float32)
        # tie runs: same consecutive sorted value -> same run id; average the
        # 1-based ranks within each run
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), s[1:] != s[:-1]]
        )
        run_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        run_sum = jax.ops.segment_sum(base, run_id, num_segments=n)
        run_cnt = jax.ops.segment_sum(jnp.ones_like(base), run_id, num_segments=n)
        ranks = (run_sum / jnp.maximum(run_cnt, 1.0))[run_id]
        inv = jnp.zeros_like(ranks).at[order].set(ranks)
        r_pos = (inv * pos).sum()
        auc = (r_pos - n_pos * (n_pos + 1) / 2) / jnp.maximum(n_pos * n_neg, 1.0)
        return jnp.where((n_pos > 0) & (n_neg > 0), auc, 0.5)

    aucs = jax.vmap(one_class)(jnp.arange(num_classes))
    return aucs.mean()


def classification_report(logits, labels, num_classes: int):
    """Full metric dict used by eval CLIs (macro + per-class + AUROC)."""
    logits = logits.astype(jnp.float32)
    preds = logits.argmax(axis=-1)
    probs = jax.nn.softmax(logits, axis=-1)
    cm = confusion_matrix(preds, labels, num_classes)
    out = dict(macro_metrics(cm))
    out["auroc_macro"] = auroc_ovr_macro(probs, labels, num_classes)
    out["per_class"] = per_class_metrics(cm)
    out["confusion_matrix"] = cm
    return out
