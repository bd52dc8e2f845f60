"""Device-side LAB stain normalization.

Replaces the reference's OpenCV-based StainNormalizer (data_loader.py:18-34):
per-image LAB statistics matched to a target mean/std. The reference runs
cv2 on the host per sample; here the whole batch converts RGB->LAB->RGB as
fused jnp math on device (8-bit OpenCV LAB scaling conventions).
"""

from __future__ import annotations

import jax.numpy as jnp


def _srgb_to_linear(c):
    return jnp.where(c > 0.04045, ((c + 0.055) / 1.055) ** 2.4, c / 12.92)


def _linear_to_srgb(c):
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c > 0.0031308, 1.055 * c ** (1 / 2.4) - 0.055, 12.92 * c)


_RGB2XYZ = jnp.array(
    [[0.412453, 0.357580, 0.180423],
     [0.212671, 0.715160, 0.072169],
     [0.019334, 0.119193, 0.950227]]
)
_XYZ_REF = jnp.array([0.950456, 1.0, 1.088754])


def _f(t):
    d = 6.0 / 29.0
    return jnp.where(t > d**3, jnp.cbrt(t), t / (3 * d * d) + 4.0 / 29.0)


def _f_inv(t):
    d = 6.0 / 29.0
    return jnp.where(t > d, t**3, 3 * d * d * (t - 4.0 / 29.0))


def rgb_to_lab_u8(rgb01: jnp.ndarray) -> jnp.ndarray:
    """RGB [0,1] -> OpenCV 8-bit LAB scale: L in [0,255], a/b offset by 128."""
    lin = _srgb_to_linear(rgb01)
    xyz = lin @ _RGB2XYZ.T / _XYZ_REF
    fx, fy, fz = _f(xyz[..., 0]), _f(xyz[..., 1]), _f(xyz[..., 2])
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([L * 255.0 / 100.0, a + 128.0, b + 128.0], axis=-1)


def lab_u8_to_rgb(lab: jnp.ndarray) -> jnp.ndarray:
    L = lab[..., 0] * 100.0 / 255.0
    a = lab[..., 1] - 128.0
    b = lab[..., 2] - 128.0
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    xyz = jnp.stack([_f_inv(fx), _f_inv(fy), _f_inv(fz)], axis=-1) * _XYZ_REF
    lin = xyz @ jnp.linalg.inv(_RGB2XYZ).T
    return _linear_to_srgb(lin)


def stain_normalize(rgb01: jnp.ndarray, target_mean, target_std) -> jnp.ndarray:
    """Per-image LAB moment matching (reference data_loader.py:25-34).

    rgb01: (B, H, W, 3) in [0,1]. target_mean/std: 3-vectors in 8-bit LAB
    units (defaults in the reference: mean [150,140,140], std [20,20,20]).
    """
    tm = jnp.asarray(target_mean, jnp.float32)
    ts = jnp.asarray(target_std, jnp.float32)
    lab = rgb_to_lab_u8(rgb01)
    mean = lab.mean(axis=(1, 2), keepdims=True)
    std = lab.std(axis=(1, 2), keepdims=True)
    std = jnp.where(std < 1e-6, 1.0, std)
    lab = (lab - mean) / std * ts + tm
    lab = jnp.clip(lab, 0.0, 255.0)
    return jnp.clip(lab_u8_to_rgb(lab), 0.0, 1.0)
