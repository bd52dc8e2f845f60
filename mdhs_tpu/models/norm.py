"""BatchNorm with torch-exact running-statistics semantics.

torch's `nn.BatchNorm2d` (used by every reference CNN tower — torchvision
ResNet/ConvNeXt, mibf_net/model_resnet.py:15, MambaVision patch embed)
normalizes the batch with the *biased* variance but updates `running_var`
with the *unbiased* variance (Bessel-corrected, N/(N-1)). Flax's
`nn.BatchNorm` uses the biased variance for both, so a training run's
running stats drift from a torch twin's by a factor of N/(N-1) per step —
which breaks one-step training parity and checkpoint interchange for
models trained here and evaluated in torch (or vice versa).

This module is flax's BatchNorm with only the running-update corrected:
same param/variable names ("scale"/"bias", batch_stats "mean"/"var"),
same flax momentum convention (decay; flax 0.9 == torch momentum 0.1),
same dtype behavior (stats in f32, normalization in `dtype`).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class TorchBatchNorm(nn.Module):
    """Drop-in replacement for nn.BatchNorm (feature axis -1).

    Differences from flax: running_var is updated with the unbiased batch
    variance (torch parity, see module docstring). Normalization itself is
    identical (biased variance, matching both frameworks).
    """

    use_running_average: Optional[bool] = None
    momentum: float = 0.9  # flax convention: decay on the running stats
    epsilon: float = 1e-5
    dtype: Any = None
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        feat = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            from ..ops import bn_stats as _bns

            axes = tuple(range(x.ndim - 1))
            if _bns.use_kernel(x.shape, x.dtype):
                # one-HBM-pass Chan-combined statistics (ops/bn_stats.py):
                # numerically ~1 ulp from the two-pass result, saves a full
                # read of every large BN input per training step
                mean, var = _bns.bn_stats(x)
            else:
                # biased variance for normalization (torch & flax agree on
                # the value). Two-pass E[(x-mu)^2] like torch — NOT flax's
                # E[x^2]-mu^2, whose cancellation noise visibly accumulates
                # through deep BN stacks (measured ~2% grad error at the
                # resnet50 stem in the one-step training differential).
                # Kept in sync with ops/bn_stats.bn_stats_reference (the
                # oracle the kernel differential tests compare against).
                mean, var = _bns.bn_stats_reference(x)
            if not self.is_initializing():
                n = 1
                for ax in axes:
                    n *= x.shape[ax]
                bessel = n / max(n - 1, 1)
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * (var * bessel)

        # flax-identical op ordering: mul = rsqrt(var+eps) [* scale];
        # y = (x-mean) * mul [+ bias] — keeps bf16 rounding bit-identical
        # to the nn.BatchNorm eval path the parity tests pinned.
        dtype = self.dtype or x.dtype
        mul = jax.lax.rsqrt(var.astype(dtype) + jnp.asarray(self.epsilon, dtype))
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
            mul = mul * scale.astype(dtype)
        y = (x.astype(dtype) - mean.astype(dtype)) * mul
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
            y = y + bias.astype(dtype)
        return y
