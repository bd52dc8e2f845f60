"""Fused test-time augmentation.

The reference loops the model over TTA variants (orig, hflip, vflip, rot90)
and averages logits (scripts/predict.py:33-42, 63-70). On TPU we stack the
variants on the batch axis and run ONE forward — 4x larger matmuls instead
of 4 kernel launches (the north-star "TTA fused as a single batched call").
"""

from __future__ import annotations

import jax.numpy as jnp

TTA_TRANSFORMS = ("hflip", "vflip", "rot90")


def tta_variants(images: jnp.ndarray, transforms=TTA_TRANSFORMS) -> jnp.ndarray:
    """images NHWC -> (V, B, H, W, C) stack: original + requested variants."""
    variants = [images]
    for name in transforms:
        if name == "hflip":
            variants.append(images[:, :, ::-1, :])
        elif name == "vflip":
            variants.append(images[:, ::-1, :, :])
        elif name == "rot90":
            # torch.rot90(k=1, dims=(-2,-1)) on NCHW == rotate in the HW plane;
            # NHWC equivalent: transpose H/W then flip rows.
            variants.append(jnp.transpose(images, (0, 2, 1, 3))[:, ::-1, :, :])
    return jnp.stack(variants, axis=0)


def tta_logits(apply_fn, images: jnp.ndarray, *args, transforms=TTA_TRANSFORMS, **kwargs):
    """Run apply_fn over the fused variant batch and mean-reduce logits.

    apply_fn(images, *args) -> logits. Non-image args are tiled on batch.
    """
    v = tta_variants(images, transforms)
    V, B = v.shape[0], v.shape[1]
    flat = v.reshape(V * B, *v.shape[2:])
    tiled_args = [
        jnp.concatenate([a] * V, axis=0) if hasattr(a, "ndim") and a.ndim >= 1 else a
        for a in args
    ]
    logits = apply_fn(flat, *tiled_args, **kwargs)
    return logits.reshape(V, B, *logits.shape[1:]).mean(axis=0)
