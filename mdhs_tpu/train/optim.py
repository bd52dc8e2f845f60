"""Optimizers and LR schedules in optax.

Parity targets (reference scripts/train.py:255-336):
- Adam / AdamW / SGD by name
- Muon with aux Adam: params with ndim >= 2 get Newton–Schulz
  orthogonalized momentum updates; the rest get Adam. The reference pulls
  this from the external `muon` package (KellerJordan/Muon) behind a dummy
  1-process dist init; ours is a native optax transform (no process groups
  needed — Muon's orthogonalization is purely local math).
- cosine (epoch-stepped) and warmup_cosine (per-step LambdaLR) schedules.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..core.registry import OPTIMIZERS, SCHEDULES


# ---------------------------------------------------------------------------
# Muon
# ---------------------------------------------------------------------------

def newton_schulz_orthogonalize(g: jnp.ndarray, steps: int = 5, eps: float = 1e-7):
    """Quintic Newton–Schulz iteration driving singular values toward 1.

    Operates on the last two axes; runs in bfloat16 like the reference
    implementation of Muon (stable by design of the coefficients).
    """
    a, b, c = 3.4445, -4.7750, 2.0315
    x = g.astype(jnp.bfloat16)
    transposed = x.shape[-2] > x.shape[-1]
    if transposed:
        x = x.swapaxes(-2, -1)
    x = x / (jnp.linalg.norm(x.astype(jnp.float32), axis=(-2, -1), keepdims=True) + eps).astype(
        jnp.bfloat16
    )
    for _ in range(steps):
        A = x @ x.swapaxes(-2, -1)
        B = b * A + c * (A @ A)
        x = a * x + B @ x
    if transposed:
        x = x.swapaxes(-2, -1)
    return x.astype(g.dtype)


class MuonState(NamedTuple):
    momentum: optax.Updates


def scale_by_muon(momentum: float = 0.95, nesterov: bool = True, ns_steps: int = 5):
    """Muon: momentum -> Newton–Schulz orthogonalization -> shape rescale."""

    def init_fn(params):
        return MuonState(momentum=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        buf = jax.tree_util.tree_map(
            lambda m, g: momentum * m + g, state.momentum, updates
        )
        if nesterov:
            eff = jax.tree_util.tree_map(lambda g, m: g + momentum * m, updates, buf)
        else:
            eff = buf

        def ortho(g):
            if g.ndim < 2:
                return g
            if g.ndim > 2:
                # Flax conv kernels are HWIO (output channels LAST). Torch
                # Muon matricizes OIHW as weight.view(out, -1); the
                # equivalent view here puts the output-channel axis leading:
                # (H*W*I, O) -> transpose -> (O, fan_in). Newton–Schulz is
                # invariant to the column permutation between (I,H,W) and
                # (H,W,I) flattening, so this matches torch Muon's geometry.
                g2 = g.reshape(-1, g.shape[-1]).T
            else:
                g2 = g
            o = newton_schulz_orthogonalize(g2, ns_steps)
            if g.ndim == 2:
                # Flax dense kernels are (in, out); torch Muon scales by
                # max(1, out/in)**0.5 on its (out, in) weights. Newton–Schulz
                # is transpose-equivariant so no transpose is needed — only
                # the scale must use torch's orientation: rows=out, cols=in.
                scale = max(1.0, g2.shape[1] / g2.shape[0]) ** 0.5
            else:
                # g2 is already (O, fan_in) = torch orientation.
                scale = max(1.0, g2.shape[0] / g2.shape[1]) ** 0.5
            o = o * scale
            if g.ndim > 2:
                o = o.T.reshape(g.shape)
            return o

        return jax.tree_util.tree_map(ortho, eff), MuonState(momentum=buf)

    return optax.GradientTransformation(init_fn, update_fn)


def muon_with_aux_adam(
    muon_lr: float = 0.02,
    muon_weight_decay: float = 0.01,
    muon_momentum: float = 0.95,
    aux_lr: float = 3e-4,
    aux_betas=(0.9, 0.95),
    aux_weight_decay: float = 0.01,
    lr_factor=None,
):
    """ndim>=2 params -> Muon; others -> AdamW (reference train.py:289-307).

    lr_factor: optional schedule multiplier (step -> factor). torch's
    CosineAnnealingLR / LambdaLR scale EVERY param group's lr each step
    (reference train.py:313-334), so both the Muon and aux-Adam groups
    must see the configured lr_scheduler, not fixed lrs.
    """
    if lr_factor is None:
        muon_sched, aux_sched = muon_lr, aux_lr
    else:
        muon_sched = lambda step: muon_lr * lr_factor(step)  # noqa: E731
        aux_sched = lambda step: aux_lr * lr_factor(step)  # noqa: E731
    muon_tx = optax.chain(
        scale_by_muon(momentum=muon_momentum),
        optax.add_decayed_weights(muon_weight_decay),
        optax.scale_by_learning_rate(muon_sched),
    )
    adam_tx = optax.chain(
        optax.scale_by_adam(b1=aux_betas[0], b2=aux_betas[1]),
        optax.add_decayed_weights(aux_weight_decay),
        optax.scale_by_learning_rate(aux_sched),
    )

    def label_fn(params):
        return jax.tree_util.tree_map(
            lambda p: "muon" if getattr(p, "ndim", 0) >= 2 else "adam", params
        )

    return optax.multi_transform({"muon": muon_tx, "adam": adam_tx}, label_fn)


# ---------------------------------------------------------------------------
# Schedules
# ---------------------------------------------------------------------------

@SCHEDULES.register("cosine")
def cosine_schedule(base_lr: float, *, num_epochs: int, steps_per_epoch: int, **_):
    """Epoch-granularity CosineAnnealingLR(T_max=num_epochs)
    (reference train.py:317-320): lr(e) = base * (1 + cos(pi e / E)) / 2."""

    def fn(step):
        epoch = jnp.floor(step / max(1, steps_per_epoch))
        return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / max(1, num_epochs)))

    return fn


@SCHEDULES.register("warmup_cosine")
def warmup_cosine_schedule(
    base_lr: float, *, num_epochs: int, steps_per_epoch: int, warmup_epochs: int = 5, **_
):
    """Per-step warmup + cosine (reference train.py:321-334)."""
    total_steps = num_epochs * steps_per_epoch
    warmup_steps = min(int(warmup_epochs * steps_per_epoch), total_steps)

    def fn(step):
        warm = base_lr * (step + 1.0) / max(1, warmup_steps)
        progress = step - warmup_steps
        cosine_steps = max(1, total_steps - warmup_steps)
        cos = base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * progress / cosine_steps))
        return jnp.where(step < warmup_steps, warm, cos)

    return fn


@SCHEDULES.register("constant")
def constant_schedule(base_lr: float, **_):
    return lambda step: jnp.asarray(base_lr, jnp.float32)


def make_schedule(name: Optional[str], base_lr: float, **kwargs):
    if not name:
        return constant_schedule(base_lr)
    key = name.lower().replace("-", "_")
    if key not in SCHEDULES:
        # reference logs "unrecognized scheduler" and proceeds without one
        return constant_schedule(base_lr)
    return SCHEDULES.get(key)(base_lr, **kwargs)


# ---------------------------------------------------------------------------
# Optimizer factory
# ---------------------------------------------------------------------------

@OPTIMIZERS.register("adam")
def _adam(lr_schedule, cfg):
    return optax.adam(lr_schedule)


@OPTIMIZERS.register("adamw")
def _adamw(lr_schedule, cfg):
    # torch.optim.AdamW defaults to weight_decay=1e-2 (the reference never
    # overrides it, scripts/train.py:260); optax.adamw defaults to 1e-4.
    wd = 0.01
    if cfg is not None:
        t = cfg.get("training", {})
        get = t.get if hasattr(t, "get") else (lambda *a: a[1] if len(a) > 1 else None)
        wd = float(get("weight_decay", 0.01))
    return optax.adamw(lr_schedule, weight_decay=wd)


@OPTIMIZERS.register("sgd")
def _sgd(lr_schedule, cfg):
    return optax.sgd(lr_schedule)


@OPTIMIZERS.register("muon")
def _muon(lr_schedule, cfg):
    t = cfg.get("training", {}) if cfg is not None else {}
    get = t.get if hasattr(t, "get") else (lambda *a: a[1] if len(a) > 1 else None)
    # lr_schedule is absolute (built from training.learning_rate); Muon's
    # groups use their own base lrs, so recover the multiplicative factor
    # the torch schedulers apply to every param group (train.py:313-334).
    lr_factor = None
    if callable(lr_schedule):
        base_lr = float(get("learning_rate", 1e-4)) or 1.0
        lr_factor = lambda step: lr_schedule(step) / base_lr  # noqa: E731
    return muon_with_aux_adam(
        muon_lr=get("muon_lr", 0.02),
        muon_weight_decay=get("muon_weight_decay", 0.01),
        aux_lr=get("muon_aux_lr", 3e-4),
        aux_betas=tuple(get("muon_aux_betas", (0.9, 0.95))),
        aux_weight_decay=get("muon_aux_weight_decay", 0.01),
        lr_factor=lr_factor,
    )


BUCKET_THRESHOLD_ELEMS = 1 << 17  # 512 KB f32: biases/LN/BN/small 1x1 convs


def bucketed_flatten(make_tx, threshold_elems: int = BUCKET_THRESHOLD_ELEMS):
    """Flatten only the SMALL leaves (< threshold_elems) into one vector.

    The per-leaf update costs one XLA fusion per leaf (~320 for MIBF, each
    with fixed scheduling overhead); full optax.flatten removes the
    overhead but pays extra HBM passes over the entire 540 MB tree for the
    flatten/unflatten concats (measured net LOSS through the real step —
    docs/TRAIN_PERF.md). The long tail of small leaves (biases, LN/BN
    scales) is most of the leaf COUNT but ~1% of the bytes, so flattening
    only those removes most fusions while copying a few MB.

    Built as optax.multi_transform over size-derived labels; the "small"
    branch is optax.flatten(tx) (optax.MaskedNode leaves are empty pytrees,
    so ravel_pytree skips the big leaves). Elementwise transforms only:
    per-element math is unchanged — bit-identical on CPU
    (tests/test_optim.py::test_bucketed_optimizer_matches_per_leaf); on
    TPU, XLA's fusion-dependent FMA contraction may round differently by
    ≤1 ulp (docs/TRAIN_PERF.md "Optimizer knob summary").

    make_tx: zero-arg factory — multi_transform needs an independent
    instance per branch.
    """
    def labels(tree):
        return jax.tree_util.tree_map(
            lambda leaf: "small" if leaf.size < threshold_elems else "big", tree
        )

    return optax.multi_transform(
        {"small": optax.flatten(make_tx()), "big": make_tx()}, labels
    )


def make_optimizer(name: str, lr_schedule, cfg=None, freeze_mask=None,
                   flatten=False):
    """Build optimizer by reference name (Adam/AdamW/SGD/Muon; train.py:255-309).

    freeze_mask: pytree of bools (True = trainable). Frozen params get
    zero updates (reference freezes encoders via requires_grad=False,
    train.py:214-219).

    flatten: False | True | "bucketed". True wraps in optax.flatten — the
    update runs on ONE flat vector instead of one XLA fusion per leaf
    (~320 for MIBF); measured a net LOSS through the real step (the
    full-tree flatten/unflatten copies outweigh the saved fusions,
    docs/TRAIN_PERF.md). "bucketed" flattens only the small leaves — see
    bucketed_flatten. Identical math for the elementwise optimizers;
    invalid for Muon (per-matrix orthogonalization needs leaf shapes) and
    for masked freezing (the bool tree no longer aligns), so the Trainer
    gates it — misuse raises here.
    """
    if flatten not in (False, True, "bucketed"):
        raise ValueError(
            f"training.flatten_optimizer must be false, true, or 'bucketed'; "
            f"got {flatten!r}"
        )
    if flatten and (freeze_mask is not None or name.lower() == "muon"):
        raise ValueError(
            "flatten_optimizer is incompatible with Muon and with frozen "
            "encoders (per-leaf structure is required)"
        )
    if flatten == "bucketed":
        return bucketed_flatten(lambda: OPTIMIZERS.get(name.lower())(lr_schedule, cfg))
    tx = OPTIMIZERS.get(name.lower())(lr_schedule, cfg)
    if flatten:
        return optax.flatten(tx)
    if freeze_mask is not None:
        # optax.masked leaves non-selected leaves' updates UNCHANGED (the raw
        # gradient would flow through as the update), so the frozen
        # complement must be explicitly zeroed. The reference freezes via
        # requires_grad=False + a params_to_update filter (train.py:214-219,
        # :255), i.e. frozen params receive no update at all.
        inverse = jax.tree_util.tree_map(lambda t: not t, freeze_mask)
        tx = optax.chain(
            optax.masked(tx, freeze_mask),
            optax.masked(optax.set_to_zero(), inverse),
        )
    return tx
