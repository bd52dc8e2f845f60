"""Grad-CAM, functionally (no hooks).

Parity with reference analysis_tools.py:9-140 / scripts/run_analysis.py:
CAMs over the 5 ResNet taps (stem, layer1..layer4): per-layer channel
weights = GAP of activation gradients, cam = ReLU(sum_c w_c A_c),
per-layer min-max normalize, resize to input, average across layers;
JET-overlay visualization.

TPU-native mechanism: the ResNet taps are `nn.perturb` points — zero-valued
variables added to the activations, and the model returns the tap values
functionally. d(score)/d(perturbation) IS the activation gradient, so ONE
jax.grad over the perturbations collection yields every layer's gradients
and activations in a single compiled forward+backward (the reference needs
forward+backward hooks and a separate retained graph).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_LAYERS = ("stem", "layer1", "layer2", "layer3", "layer4")


def _find_leaf(tree, name):
    import flax.traverse_util as tu

    if tree is None:
        return None
    if isinstance(tree, dict) and name in tree and hasattr(tree[name], "ndim"):
        return tree[name]
    flat = tu.flatten_dict(tree, sep="/") if isinstance(tree, dict) else {}
    for key, val in flat.items():
        if key.split("/")[-1] == name:
            return val
    return None


def gradcam_device(
    forward: Callable[[dict], tuple],
    variables: dict,
    *,
    target_class=None,
    layers: Sequence[str] = DEFAULT_LAYERS,
    image_size: int = 224,
    return_layer_cams: bool = False,
):
    """Traceable Grad-CAM core: pure jnp, safe to call under jax.jit.

    forward(variables) -> (logits (B,C), taps dict with stem/layer1..4).
    `variables` must include the zero "perturbations" collection from
    model.init. Returns (cams (B, S, S) in [0,1], logits)
    [, per-layer cam dict when return_layer_cams] — all jnp.

    Per-layer math matches analysis_tools.py:74-111 exactly: weights =
    GAP(grad), cam = ReLU(sum_c w_c A_c), divide by max (no min shift —
    the reference does `cam / max` when max > 0), bilinear resize,
    average, re-normalize the average by its max (:105-109).
    """
    perts = variables.get("perturbations")
    if perts is None:
        raise ValueError("variables must contain a 'perturbations' collection")
    base = {k: v for k, v in variables.items() if k != "perturbations"}

    def score_fn(p):
        logits, taps = forward({**base, "perturbations": p})
        cls = jnp.argmax(logits, axis=-1) if target_class is None else target_class
        onehot = jax.nn.one_hot(cls, logits.shape[-1], dtype=logits.dtype)
        return (logits.astype(jnp.float32) * onehot).sum(), (logits, taps)

    grads, (logits, taps) = jax.grad(score_fn, has_aux=True)(perts)

    cams = []
    layer_cams = {}
    for name in layers:
        g = _find_leaf(grads, name)
        a = _find_leaf(taps, name)
        if g is None or a is None:
            continue
        w = g.astype(jnp.float32).mean(axis=(1, 2))  # (B, C): GAP of gradients
        cam = jnp.einsum("bhwc,bc->bhw", a.astype(jnp.float32), w)
        cam = jax.nn.relu(cam)
        mx = cam.max(axis=(1, 2), keepdims=True)
        cam = jnp.where(mx > 0, cam / jnp.where(mx > 0, mx, 1.0), cam)
        cam = jax.image.resize(cam, (cam.shape[0], image_size, image_size), "bilinear")
        cams.append(cam)
        if return_layer_cams:
            layer_cams[name] = cam
    if not cams:
        raise ValueError(f"no CAM layers found among {layers}")
    avg = sum(cams) / len(cams)
    mx = avg.max(axis=(1, 2), keepdims=True)
    avg = jnp.where(mx > 0, avg / jnp.where(mx > 0, mx, 1.0), avg)
    if return_layer_cams:
        return avg, logits, layer_cams
    return avg, logits


def gradcam(forward, variables, *, return_layer_cams: bool = False, **kw):
    """Host wrapper over gradcam_device: same math, np.ndarray outputs.

    One-shot convenience (tests, single batches). Loops should jit
    gradcam_device once with batch tensors as ARGUMENTS — a fresh closure
    per batch defeats the jit cache and runs eagerly (30-40ms/dispatch
    through the relay); see cli/run_analysis.py.
    """
    out = gradcam_device(
        forward, variables, return_layer_cams=return_layer_cams, **kw
    )
    if return_layer_cams:
        avg, logits, layer_cams = out
        return (
            np.asarray(avg),
            np.asarray(logits),
            {k: np.asarray(v) for k, v in layer_cams.items()},
        )
    avg, logits = out
    return np.asarray(avg), np.asarray(logits)


def visualize_cam(image_rgb01: np.ndarray, cam: np.ndarray, alpha: float = 0.5) -> np.ndarray:
    """JET overlay (reference analysis_tools.py:122-140). Host-side, uint8."""
    import cv2

    heat = cv2.applyColorMap((cam * 255).astype(np.uint8), cv2.COLORMAP_JET)
    heat = cv2.cvtColor(heat, cv2.COLOR_BGR2RGB)
    base = (np.clip(image_rgb01, 0, 1) * 255).astype(np.uint8)
    if base.shape[:2] != heat.shape[:2]:
        heat = cv2.resize(heat, (base.shape[1], base.shape[0]))
    return (alpha * heat + (1 - alpha) * base).astype(np.uint8)
