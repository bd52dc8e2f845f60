"""Device-side training augmentation: one fused affine resample + color ops.

Replaces the reference's CPU-side torchvision train transform
(data_loader.py:343-360): RandomResizedCrop(224, scale=(0.2,1.0)) ->
HFlip -> VFlip -> RandomRotation(45) -> ColorJitter(0.2,0.2,0.2,0.1) ->
Normalize.

TPU-first design: all geometric transforms (crop window, flips, rotation)
compose into ONE affine matrix per sample, applied with a single bilinear
gather (vmapped map_coordinates). Color jitter runs as fused elementwise
math on the result. The whole pipeline is jitted and batched; the host
only ships uint8 canvases.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from .preprocess import normalize_imagenet


# ---------------------------------------------------------------------------
# Affine sampling
# ---------------------------------------------------------------------------

def _bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """img: (H, W, C); coords: (2, Ho, Wo) row/col float coords ->
    (Ho, Wo, C), zero padding outside."""
    from jax.scipy.ndimage import map_coordinates

    def per_channel(ch):
        return map_coordinates(ch, [coords[0], coords[1]], order=1, mode="constant", cval=0.0)

    return jnp.stack([per_channel(img[..., c]) for c in range(img.shape[-1])], axis=-1)


def affine_grid(matrix: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """matrix: (2, 3) mapping output (row, col, 1) -> source (row, col).
    Returns coords (2, out_h, out_w)."""
    rows = jnp.arange(out_h, dtype=jnp.float32)
    cols = jnp.arange(out_w, dtype=jnp.float32)
    rr, cc = jnp.meshgrid(rows, cols, indexing="ij")
    ones = jnp.ones_like(rr)
    pts = jnp.stack([rr, cc, ones], axis=0).reshape(3, -1)  # (3, Ho*Wo)
    src = matrix @ pts  # (2, Ho*Wo)
    return src.reshape(2, out_h, out_w)


def affine_sample(images: jnp.ndarray, matrices: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """images: (B, H, W, C) float; matrices: (B, 2, 3). One gather per image."""

    def one(img, m):
        coords = affine_grid(m, out_size, out_size)
        return _bilinear_sample(img, coords)

    return jax.vmap(one)(images, matrices)


# ---------------------------------------------------------------------------
# Random affine parameter sampling (composed crop+flip+rotate)
# ---------------------------------------------------------------------------

def _compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose 2x3 affines: result(x) = a(b(x)) in homogeneous coords."""
    a3 = jnp.concatenate([a, jnp.array([[0.0, 0.0, 1.0]])], axis=0)
    b3 = jnp.concatenate([b, jnp.array([[0.0, 0.0, 1.0]])], axis=0)
    return (b3 @ a3)[:2]


def random_affine_matrix(
    key,
    canvas: int,
    out_size: int,
    *,
    scale_range=(0.2, 1.0),
    ratio_range=(3.0 / 4.0, 4.0 / 3.0),
    hflip: bool = True,
    vflip: bool = True,
    degrees: float = 45.0,
) -> jnp.ndarray:
    """Sample one (2,3) matrix: output pixel -> canvas pixel.

    Order matches the reference transform stack: the crop window is sampled
    on the canvas (RandomResizedCrop), flips mirror the output, rotation
    spins about the output center.
    """
    k_area, k_ratio, k_hf, k_vf, k_ang, k_x, k_y = jax.random.split(key, 7)
    area = canvas * canvas * jax.random.uniform(k_area, (), minval=scale_range[0], maxval=scale_range[1])
    log_r = jax.random.uniform(
        k_ratio, (), minval=math.log(ratio_range[0]), maxval=math.log(ratio_range[1])
    )
    ratio = jnp.exp(log_r)
    w = jnp.sqrt(area * ratio)
    h = jnp.sqrt(area / ratio)
    w = jnp.clip(w, 8.0, canvas)
    h = jnp.clip(h, 8.0, canvas)
    y0 = jax.random.uniform(k_y, (), minval=0.0, maxval=1.0) * (canvas - h)
    x0 = jax.random.uniform(k_x, (), minval=0.0, maxval=1.0) * (canvas - w)

    # rotation about output center (output coords -> output coords)
    ang = jax.random.uniform(k_ang, (), minval=-degrees, maxval=degrees) * math.pi / 180.0
    c, s = jnp.cos(ang), jnp.sin(ang)
    half = (out_size - 1) / 2.0
    rot = jnp.array(
        [
            [c, -s, half - c * half + s * half],
            [s, c, half - s * half - c * half],
        ]
    )

    # flips (output coords -> output coords)
    do_h = jax.random.bernoulli(k_hf) & hflip
    do_v = jax.random.bernoulli(k_vf) & vflip
    flip = jnp.array(
        [
            [jnp.where(do_v, -1.0, 1.0), 0.0, jnp.where(do_v, out_size - 1.0, 0.0)],
            [0.0, jnp.where(do_h, -1.0, 1.0), jnp.where(do_h, out_size - 1.0, 0.0)],
        ]
    )

    # crop+resize (output coords -> canvas coords)
    crop = jnp.array(
        [
            [h / out_size, 0.0, y0],
            [0.0, w / out_size, x0],
        ]
    )

    # output -> rotate -> flip -> crop window -> canvas
    return _compose(_compose(rot, flip), crop)


# ---------------------------------------------------------------------------
# Color jitter (torchvision semantics, fused elementwise)
# ---------------------------------------------------------------------------

def _rgb_to_hsv(x):
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-8), 0.0)
    safe = jnp.maximum(delta, 1e-8)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = (h / 6.0) % 1.0
    h = jnp.where(delta < 1e-8, 0.0, h)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(x):
    h, s, v = x[..., 0], x[..., 1], x[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def color_jitter(key, x, brightness=0.2, contrast=0.2, saturation=0.2, hue=0.1):
    """x: (B, H, W, 3) in [0,1]. Per-sample factors, torchvision ranges."""
    B = x.shape[0]
    kb, kc, ks, kh = jax.random.split(key, 4)
    fb = jax.random.uniform(kb, (B, 1, 1, 1), minval=1 - brightness, maxval=1 + brightness)
    fc = jax.random.uniform(kc, (B, 1, 1, 1), minval=1 - contrast, maxval=1 + contrast)
    fs = jax.random.uniform(ks, (B, 1, 1), minval=1 - saturation, maxval=1 + saturation)
    fh = jax.random.uniform(kh, (B, 1, 1), minval=-hue, maxval=hue)

    x = jnp.clip(x * fb, 0.0, 1.0)
    # contrast about the per-image grayscale mean (torchvision semantics)
    gray = (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])
    mean = gray.mean(axis=(1, 2), keepdims=True)[..., None]
    x = jnp.clip((x - mean) * fc + mean, 0.0, 1.0)
    hsv = _rgb_to_hsv(x)
    h = (hsv[..., 0] + fh) % 1.0
    s = jnp.clip(hsv[..., 1] * fs, 0.0, 1.0)
    x = _hsv_to_rgb(jnp.stack([h, s, hsv[..., 2]], axis=-1))
    return jnp.clip(x, 0.0, 1.0)


# ---------------------------------------------------------------------------
# Full train pipeline
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("out_size", "normalize", "enable_color"))
def train_pipeline(key, images_uint8, out_size: int = 224, normalize: bool = True,
                   enable_color: bool = True):
    """uint8 canvases (B, S, S, 3) -> augmented normalized (B, out, out, 3).

    One fused program: affine gather (crop+flip+rotate) + color jitter +
    normalize, all on device.
    """
    B, S = images_uint8.shape[0], images_uint8.shape[1]
    k_aff, k_col = jax.random.split(key)
    mats = jax.vmap(
        lambda k: random_affine_matrix(k, S, out_size)
    )(jax.random.split(k_aff, B))
    x = images_uint8.astype(jnp.float32) / 255.0
    x = affine_sample(x, mats, out_size)
    if enable_color:
        x = color_jitter(k_col, x)
    if normalize:
        return normalize_imagenet(x)
    return x.astype(jnp.bfloat16)
