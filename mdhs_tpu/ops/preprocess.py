"""Device-side eval preprocessing: uint8 canvas -> normalized NHWC floats.

The host ships uint8 canvases (shortest side resized + center-cropped
square, data/datasets.py); everything after that is jitted device compute,
replacing torchvision's CPU-side Resize/CenterCrop/ToTensor/Normalize
(reference data_loader.py:361-371). This keeps host->device transfers at
1 byte/pixel and fuses normalize into the first conv's producer.
"""

from __future__ import annotations

import jax.numpy as jnp

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


def normalize_imagenet(x: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """x: (..., 3) float in [0,1] -> ImageNet-normalized, cast to dtype."""
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return x.astype(dtype)


def to_float(x_uint8: jnp.ndarray) -> jnp.ndarray:
    return x_uint8.astype(jnp.float32) / 255.0


def center_crop(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Static center crop on NHWC (or NTHWC) arrays."""
    H, W = x.shape[-3], x.shape[-2]
    y0 = (H - size) // 2
    x0 = (W - size) // 2
    return x[..., y0 : y0 + size, x0 : x0 + size, :]


def eval_pipeline(images_uint8: jnp.ndarray, image_size: int = 224,
                  normalize: bool = True, dtype=jnp.bfloat16) -> jnp.ndarray:
    """uint8 canvas batch -> center-cropped, normalized NHWC activation.

    Matches torchvision Resize(256)+CenterCrop(224)+Normalize semantics
    given the host canvas convention. `normalize=False` reproduces the MIBF
    pipeline, which has no Normalize (reference dataset_spine.py:62-69).
    """
    x = center_crop(images_uint8, image_size)
    x = to_float(x)
    if normalize:
        return normalize_imagenet(x, dtype)
    return x.astype(dtype)
