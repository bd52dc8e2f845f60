"""Host-side augmentation with exact torchvision semantics (opt-in).

The default training path augments on device (ops/augment.py) — fused and
fast, but it crops from the square host canvas rather than the original
image, and uses bilinear rotation. This module is the strict-parity
alternative (`data.augment.host: true`): PIL/numpy transforms that
reproduce the reference pipeline exactly (data_loader.py:343-360):

  RandomResizedCrop(size, scale=(0.2, 1.0))   # torchvision sampling alg
  RandomHorizontalFlip / RandomVerticalFlip
  RandomRotation(45)                          # NEAREST, fill 0 (tv default)
  ColorJitter(0.2, 0.2, 0.2, 0.1)             # random op order (tv semantics)

Outputs uint8 (size, size, 3); normalization stays on device.
"""

from __future__ import annotations

import math
import random
from typing import Tuple

import numpy as np
from PIL import Image


def random_resized_crop(img: Image.Image, size: int, rng: random.Random,
                        scale=(0.2, 1.0), ratio=(3 / 4, 4 / 3)) -> Image.Image:
    """torchvision RandomResizedCrop.get_params: 10 tries, then center fallback."""
    w, h = img.size
    area = w * h
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = math.exp(rng.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            x0 = rng.randint(0, w - cw)
            y0 = rng.randint(0, h - ch)
            crop = img.crop((x0, y0, x0 + cw, y0 + ch))
            return crop.resize((size, size), Image.BILINEAR)
    # fallback: center crop at clamped aspect
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        ch, cw = h, int(round(h * ratio[1]))
    else:
        cw, ch = w, h
    x0 = (w - cw) // 2
    y0 = (h - ch) // 2
    return img.crop((x0, y0, x0 + cw, y0 + ch)).resize((size, size), Image.BILINEAR)


def _adjust_brightness(arr: np.ndarray, factor: float) -> np.ndarray:
    return np.clip(arr * factor, 0, 255)


def _adjust_contrast(arr: np.ndarray, factor: float) -> np.ndarray:
    gray = arr @ np.array([0.299, 0.587, 0.114])
    mean = gray.mean()
    return np.clip((arr - mean) * factor + mean, 0, 255)


def _adjust_saturation(arr: np.ndarray, factor: float) -> np.ndarray:
    gray = (arr @ np.array([0.299, 0.587, 0.114]))[..., None]
    return np.clip((arr - gray) * factor + gray, 0, 255)


def _adjust_hue(arr: np.ndarray, shift: float) -> np.ndarray:
    img = Image.fromarray(arr.astype(np.uint8)).convert("HSV")
    hsv = np.array(img)
    hsv[..., 0] = (hsv[..., 0].astype(np.int16) + int(shift * 255)) % 256
    return np.asarray(Image.fromarray(hsv, "HSV").convert("RGB"), np.float64)


def color_jitter(arr: np.ndarray, rng: random.Random, brightness=0.2,
                 contrast=0.2, saturation=0.2, hue=0.1) -> np.ndarray:
    """torchvision ColorJitter: factors sampled per op, ops in random order."""
    ops = []
    if brightness:
        f = rng.uniform(1 - brightness, 1 + brightness)
        ops.append(lambda a: _adjust_brightness(a, f))
    if contrast:
        f = rng.uniform(1 - contrast, 1 + contrast)
        ops.append(lambda a: _adjust_contrast(a, f))
    if saturation:
        f = rng.uniform(1 - saturation, 1 + saturation)
        ops.append(lambda a: _adjust_saturation(a, f))
    if hue:
        f = rng.uniform(-hue, hue)
        ops.append(lambda a: _adjust_hue(a, f))
    rng.shuffle(ops)
    for op in ops:
        arr = op(arr)
    return arr


def host_train_transform(img: Image.Image, size: int, rng: random.Random, *,
                         degrees: float = 45.0, hflip: bool = True,
                         vflip: bool = True, jitter: bool = True) -> np.ndarray:
    """Full reference train transform; returns uint8 (size, size, 3)."""
    img = random_resized_crop(img, size, rng)
    if hflip and rng.random() < 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    if vflip and rng.random() < 0.5:
        img = img.transpose(Image.FLIP_TOP_BOTTOM)
    if degrees:
        angle = rng.uniform(-degrees, degrees)
        img = img.rotate(-angle, resample=Image.NEAREST, fillcolor=(0, 0, 0))
    arr = np.asarray(img, np.float64)
    if jitter:
        arr = color_jitter(arr, rng)
    return arr.astype(np.uint8)
