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
# Fast two-stage geometric path (separable resample + 3-shear rotation)
# ---------------------------------------------------------------------------
#
# The one-affine gather above is the geometrically-purest formulation, but
# XLA:TPU lowers per-pixel gathers catastrophically (~990 ms for a
# 128x256^2 batch — measured, benchmarks/warp notes in git history). The
# production path instead does:
#
#   1. crop + flip + scale as TWO batched matmuls with per-image (O, S)
#      tent-interpolation matrices (separable — 4 ms for the same batch);
#   2. rotation as THREE shears (Paeth/Catmull-Smith: Shx(a)·Shy(b)·Shx(a),
#      a=-tan(th/2), b=sin(th)), each shear a per-row wide dynamic-slice +
#      lerp in W-minor layout (~157 ms — slices are full rows, so the
#      gather is DMA-shaped).
#
# This also matches torchvision semantics MORE closely than the composed
# warp: the reference rotates the already-cropped-and-resized image with
# zero fill (RandomResizedCrop then RandomRotation, data_loader.py:343-360),
# which is exactly what stage 2 does.


def _tent_matrix(pos: jnp.ndarray, size: int) -> jnp.ndarray:
    """pos: (O,) float source positions -> (O, size) bilinear weights."""
    p0 = jnp.floor(pos)
    f = pos - p0
    base = jnp.arange(size, dtype=jnp.float32)[None, :]
    w0 = jnp.where(base == jnp.clip(p0, 0, size - 1)[:, None], (1.0 - f)[:, None], 0.0)
    w1 = jnp.where(base == jnp.clip(p0 + 1, 0, size - 1)[:, None], f[:, None], 0.0)
    return w0 + w1


def _shear_w(img: jnp.ndarray, a: jnp.ndarray, pad: int) -> jnp.ndarray:
    """img: (C, H, W); shift row r by a*(r - center) along W, bilinear,
    zero fill. pad must be a static bound on |shift|."""
    H, W = img.shape[1], img.shape[2]
    d = a * (jnp.arange(H, dtype=jnp.float32) - (H - 1) / 2.0)
    d0 = jnp.floor(d)
    f = (d - d0)[None, :, None]
    padded = jnp.pad(img, ((0, 0), (0, 0), (pad, pad)))
    start = jnp.clip(pad + d0.astype(jnp.int32), 0, 2 * pad - 1)

    def row_slice(row, s):
        return jax.lax.dynamic_slice(row, (s,), (W + 1,))

    sl = jax.vmap(lambda ch: jax.vmap(row_slice)(ch, start))(padded)  # (C, H, W+1)
    return (1.0 - f) * sl[..., :W] + f * sl[..., 1:]


def rotate_3shear(images: jnp.ndarray, angles: jnp.ndarray, max_degrees: float) -> jnp.ndarray:
    """images: (B, H, W, C); angles: (B,) radians. Rotation about the image
    center with bilinear-per-shear interpolation and zero fill.

    On TPU the three shears run as the Pallas kernel ops/shear.py (static
    shift-range accumulation; bit-exact vs the slice path below, which
    issues one tiny gather per row and measured ~150 ms for a 128x224^2
    batch vs ~a few ms for the kernel)."""
    O = images.shape[1]
    pad_x = int(math.ceil(math.tan(math.radians(max_degrees) / 2.0) * O / 2.0)) + 2
    pad_y = int(math.ceil(math.sin(math.radians(max_degrees)) * O / 2.0)) + 2

    from .shear import shear_sublane, supports

    if supports(jax.default_backend(), O, pad_x, pad_y):
        a = jnp.tan(angles / 2.0)[:, None]
        b = -jnp.sin(angles)[:, None]
        idx = (jnp.arange(O, dtype=jnp.float32) - (O - 1) / 2.0)[None, :]

        def pad_s(x, p):  # pad the sublane (shear) axis
            return jnp.pad(x, ((0, 0), (0, 0), (p, p), (0, 0)))

        # (B, H, W, C) -> (B, C, W, H): shear W (sublanes) indexed by H (lanes)
        t = jnp.transpose(images, (0, 3, 2, 1))
        t = shear_sublane(pad_s(t, pad_x), a * idx, pad_x)
        # -> shear H indexed by W
        t = jnp.swapaxes(t, 2, 3)
        t = shear_sublane(pad_s(t, pad_y), b * idx, pad_y)
        # -> shear W indexed by H again
        t = jnp.swapaxes(t, 2, 3)
        t = shear_sublane(pad_s(t, pad_x), a * idx, pad_x)
        return jnp.transpose(t, (0, 3, 2, 1))

    def one(img, ang):
        # sign convention calibrated against the gather warp: exact (0 err)
        # on linear ramps with a=+tan(ang/2), b=-sin(ang) in coordinate-map
        # form (out[r,c] = in[r, c + d(r)])
        a = jnp.tan(ang / 2.0)
        b = -jnp.sin(ang)
        t = jnp.transpose(img, (2, 0, 1))  # (C, H, W): W minor for wide slices
        t = _shear_w(t, a, pad_x)
        t = jnp.swapaxes(t, 1, 2)
        t = _shear_w(t, b, pad_y)
        t = jnp.swapaxes(t, 1, 2)
        t = _shear_w(t, a, pad_x)
        return jnp.transpose(t, (1, 2, 0))

    return jax.vmap(one)(images, angles)


def random_crop_flip_rotate(
    key,
    images: jnp.ndarray,
    out_size: int,
    *,
    scale_range=(0.2, 1.0),
    ratio_range=(3.0 / 4.0, 4.0 / 3.0),
    hflip: bool = True,
    vflip: bool = True,
    degrees: float = 45.0,
) -> jnp.ndarray:
    """Fast path: RandomResizedCrop + flips (separable matmuls) then
    RandomRotation (3 shears). images: (B, S, S, C) float in [0, 1]."""
    B, S = images.shape[0], images.shape[1]
    keys = jax.random.split(key, B)

    def params(k):
        k_area, k_ratio, k_hf, k_vf, k_ang, k_x, k_y = jax.random.split(k, 7)
        area = S * S * jax.random.uniform(k_area, (), minval=scale_range[0], maxval=scale_range[1])
        log_r = jax.random.uniform(
            k_ratio, (), minval=math.log(ratio_range[0]), maxval=math.log(ratio_range[1])
        )
        ratio = jnp.exp(log_r)
        w = jnp.clip(jnp.sqrt(area * ratio), 8.0, S)
        h = jnp.clip(jnp.sqrt(area / ratio), 8.0, S)
        y0 = jax.random.uniform(k_y, ()) * (S - h)
        x0 = jax.random.uniform(k_x, ()) * (S - w)
        do_h = jax.random.bernoulli(k_hf) & hflip
        do_v = jax.random.bernoulli(k_vf) & vflip
        ang = jax.random.uniform(k_ang, (), minval=-degrees, maxval=degrees) * math.pi / 180.0

        idx = jnp.arange(out_size, dtype=jnp.float32)
        ridx = jnp.where(do_v, out_size - 1.0 - idx, idx)
        cidx = jnp.where(do_h, out_size - 1.0 - idx, idx)
        rows = y0 + h / out_size * ridx
        cols = x0 + w / out_size * cidx
        return _tent_matrix(rows, S), _tent_matrix(cols, S), ang

    Rm, Cm, angs = jax.vmap(params)(keys)
    x = jnp.einsum("bos,bshc->bohc", Rm, images)
    x = jnp.einsum("bow,bhwc->bhoc", Cm, x)
    if degrees > 0.0:
        x = rotate_3shear(x, angs, degrees)
    return x


# ---------------------------------------------------------------------------
# Random affine parameter sampling (composed crop+flip+rotate)
# ---------------------------------------------------------------------------

def _compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose 2x3 affines: result(x) = b(a(x)) in homogeneous coords
    ((b3 @ a3) x applies a first, then b)."""
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
    """x: (B, H, W, 3) in [0,1]. Per-sample factors, torchvision op math:
    brightness = x*f; contrast = blend with the grayscale mean; saturation =
    blend with the per-pixel grayscale (NOT an HSV S-multiply — different
    chroma trajectory); hue = HSV hue shift. Deviation from torchvision
    ColorJitter: ops run in the fixed order brightness->contrast->
    saturation->hue instead of a random permutation per sample (a per-sample
    permutation would need 24 lax.switch branches inside the fused pipeline;
    the strict host path, data/augment_host.py, shuffles like torchvision).
    """
    B = x.shape[0]
    kb, kc, ks, kh = jax.random.split(key, 4)
    fb = jax.random.uniform(kb, (B, 1, 1, 1), minval=1 - brightness, maxval=1 + brightness)
    fc = jax.random.uniform(kc, (B, 1, 1, 1), minval=1 - contrast, maxval=1 + contrast)
    fs = jax.random.uniform(ks, (B, 1, 1, 1), minval=1 - saturation, maxval=1 + saturation)
    fh = jax.random.uniform(kh, (B, 1, 1), minval=-hue, maxval=hue)

    lum = jnp.array([0.299, 0.587, 0.114], x.dtype)
    x = jnp.clip(x * fb, 0.0, 1.0)
    # contrast about the per-image grayscale mean (torchvision semantics)
    gray = x @ lum
    mean = gray.mean(axis=(1, 2), keepdims=True)[..., None]
    x = jnp.clip((x - mean) * fc + mean, 0.0, 1.0)
    # saturation: blend with the per-pixel grayscale (torchvision
    # F.adjust_saturation == host _adjust_saturation)
    gray = (x @ lum)[..., None]
    x = jnp.clip((x - gray) * fs + gray, 0.0, 1.0)
    hsv = _rgb_to_hsv(x)
    h = (hsv[..., 0] + fh) % 1.0
    x = _hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))
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
    k_aff, k_col = jax.random.split(key)
    x = images_uint8.astype(jnp.float32) / 255.0
    x = random_crop_flip_rotate(k_aff, x, out_size)
    if enable_color:
        x = color_jitter(k_col, x)
    if normalize:
        return normalize_imagenet(x)
    return x.astype(jnp.bfloat16)
