"""Mamba (selective SSM) blocks on the TPU selective-scan kernel.

Native replacement for the external `mamba_ssm.Mamba` module used by the
reference's SSM fusion (modules/fusion_blocks.py:264-292), multimodal mamba
fusion (ConNexT/models/block/len4mamba.py:64-185), and the MambaVision mixer
(ConNexT/models/block/mamba_vision.py:1527-1637).

Block structure (standard Mamba-1):
  in_proj -> split (x, z) -> depthwise causal conv1d -> silu
  -> x_proj (dt, B, C) -> dt_proj + softplus
  -> selective_scan (Pallas kernel on TPU)
  -> gate by silu(z) -> out_proj
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.selective_scan import selective_scan


def _a_log_init(d_inner: int, d_state: int):
    def init(key, shape, dtype=jnp.float32):
        a = np.tile(np.arange(1, d_state + 1, dtype=np.float32), (d_inner, 1))
        return jnp.asarray(np.log(a), dtype=dtype)

    return init


def _dt_bias_init(d_inner: int, dt_min=1e-3, dt_max=1e-1):
    def init(key, shape, dtype=jnp.float32):
        import jax.random as jr

        u = jr.uniform(key, (d_inner,), dtype=jnp.float32)
        dt = jnp.exp(u * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
        dt = jnp.clip(dt, 1e-4, None)
        # inverse softplus so softplus(bias) == dt at init
        return (dt + jnp.log(-jnp.expm1(-dt))).astype(dtype)

    return init


class MambaBlock(nn.Module):
    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: int | None = None
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        """u: (B, L, d_model) -> (B, L, d_model)."""
        B_, L, D = u.shape
        d_inner = self.expand * self.d_model
        dt_rank = self.dt_rank or max(1, math.ceil(self.d_model / 16))

        xz = nn.Dense(2 * d_inner, use_bias=False, dtype=self.dtype, name="in_proj")(u)
        x, z = jnp.split(xz, 2, axis=-1)

        # Depthwise causal conv over time: pad left, feature_group_count=d_inner.
        conv_w = self.param(
            "conv1d_weight",
            nn.initializers.lecun_normal(),
            (self.d_conv, 1, d_inner),
        )
        conv_b = self.param("conv1d_bias", nn.initializers.zeros, (d_inner,))
        x_pad = jnp.pad(x, ((0, 0), (self.d_conv - 1, 0), (0, 0)))
        x = jax.lax.conv_general_dilated(
            x_pad.astype(self.dtype),
            conv_w.astype(self.dtype),
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=d_inner,
        ) + conv_b.astype(self.dtype)
        x = nn.silu(x)

        dbc = nn.Dense(dt_rank + 2 * self.d_state, use_bias=False, dtype=self.dtype, name="x_proj")(x)
        dt, Bm, Cm = jnp.split(dbc, [dt_rank, dt_rank + self.d_state], axis=-1)
        dt = nn.Dense(d_inner, use_bias=False, dtype=self.dtype, name="dt_proj")(dt)
        dt_bias = self.param("dt_bias", _dt_bias_init(d_inner), (d_inner,))
        dt = nn.softplus(dt.astype(jnp.float32) + dt_bias[None, None, :])

        a_log = self.param("A_log", _a_log_init(d_inner, self.d_state), (d_inner, self.d_state))
        A = -jnp.exp(a_log)
        d_skip = self.param("D", nn.initializers.ones, (d_inner,))

        y = selective_scan(
            x.astype(jnp.float32),
            dt,
            A,
            Bm.astype(jnp.float32),
            Cm.astype(jnp.float32),
            d_skip,
        )
        y = y.astype(self.dtype) * nn.silu(z)
        return nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="out_proj")(y)


class VMambaBlock(nn.Module):
    """Bidirectional Mamba block with pre-norm residual.

    Native stand-in for the external `VMAMBA2Block` the reference pulls from
    the EnergeSnake repo (modules/fusion_blocks.py:295-334): a forward and a
    reversed selective scan averaged, residual around a LayerNorm.
    """

    dim: int
    num_heads: int = 2  # kept for config parity; unused by the SSM
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(tokens)
        fwd = MambaBlock(d_model=self.dim, dtype=self.dtype, name="fwd")(h)
        bwd = MambaBlock(d_model=self.dim, dtype=self.dtype, name="bwd")(h[:, ::-1, :])[:, ::-1, :]
        return tokens + 0.5 * (fwd + bwd)
