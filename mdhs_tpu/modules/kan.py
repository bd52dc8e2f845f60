"""Kolmogorov–Arnold Network layers (efficient-KAN) in JAX.

Native replacement for two external dependencies of the reference:
- efficient-KAN `KANLinear`/`KAN1` (reference: ConNexT/models/block/kan1.py)
  — B-spline bases via the Cox–de Boor recursion, least-squares
  `curve2coeff` initialization, adaptive `update_grid` re-gridding, and the
  spline L1+entropy regularization.
- `ikan.GroupKAN.GroupKANLinear` used by the baseline KAN classifier head
  (reference: modules/heads.py:7-25, 108-140) — grouped learnable spline
  activations (channels in a group share coefficients) followed by a Dense.

All spline math is dense einsum/matmul — static shapes, MXU-friendly.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def make_grid(in_features: int, grid_size: int, spline_order: int, grid_range=(-1.0, 1.0)):
    h = (grid_range[1] - grid_range[0]) / grid_size
    pts = jnp.arange(-spline_order, grid_size + spline_order + 1, dtype=jnp.float32)
    grid = pts * h + grid_range[0]
    return jnp.tile(grid[None, :], (in_features, 1))  # (in, G + 2K + 1)


def b_splines(x: jnp.ndarray, grid: jnp.ndarray, spline_order: int) -> jnp.ndarray:
    """Cox–de Boor recursion.

    x: (batch, in); grid: (in, G + 2K + 1) -> bases (batch, in, G + K).
    """
    x = x[..., None].astype(jnp.float32)  # (batch, in, 1)
    g = grid[None]  # (1, in, n_pts)
    bases = ((x >= g[..., :-1]) & (x < g[..., 1:])).astype(jnp.float32)
    for k in range(1, spline_order + 1):
        left = (x - g[..., : -(k + 1)]) / (g[..., k:-1] - g[..., : -(k + 1)])
        right = (g[..., k + 1 :] - x) / (g[..., k + 1 :] - g[..., 1:-k])
        bases = left * bases[..., :-1] + right * bases[..., 1:]
    return bases


def curve2coeff(x: jnp.ndarray, y: jnp.ndarray, grid: jnp.ndarray, spline_order: int):
    """Least-squares spline coefficients interpolating (x, y).

    x: (batch, in), y: (batch, in, out) -> (out, in, G + K).
    """
    A = b_splines(x, grid, spline_order).transpose(1, 0, 2)  # (in, batch, G+K)
    B = y.transpose(1, 0, 2).astype(jnp.float32)  # (in, batch, out)
    sol = jax.vmap(lambda a, b: jnp.linalg.lstsq(a, b)[0])(A, B)  # (in, G+K, out)
    return sol.transpose(2, 0, 1)  # (out, in, G+K)


class KANLinear(nn.Module):
    """Single KAN layer: y = base_act(x) @ W_base^T + spline(x) @ W_spline^T."""

    in_features: int
    out_features: int
    grid_size: int = 5
    spline_order: int = 3
    scale_noise: float = 0.1
    scale_base: float = 1.0
    scale_spline: float = 1.0
    standalone_scale: bool = True
    grid_eps: float = 0.02
    grid_range: tuple = (-1.0, 1.0)
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        gs, k = self.grid_size, self.spline_order
        init_grid = make_grid(self.in_features, gs, k, self.grid_range)
        # grid is a mutable variable so functional update_grid can re-grid it.
        self.grid = self.variable("kan_state", "grid", lambda: init_grid)

        def base_init(key, shape, dtype=jnp.float32):
            bound = self.scale_base / (self.in_features**0.5)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        self.base_weight = self.param(
            "base_weight", base_init, (self.out_features, self.in_features)
        )

        def spline_init(key, shape, dtype=jnp.float32):
            noise = (
                (jax.random.uniform(key, (gs + 1, self.in_features, self.out_features)) - 0.5)
                * self.scale_noise
                / gs
            )
            pts = init_grid.T[k:-k]  # (G+1, in)
            coeff = curve2coeff(pts, noise, init_grid, k)
            if not self.standalone_scale:
                coeff = coeff * self.scale_spline
            return coeff.astype(dtype)

        self.spline_weight = self.param(
            "spline_weight", spline_init, (self.out_features, self.in_features, gs + k)
        )
        if self.standalone_scale:
            def scaler_init(key, shape, dtype=jnp.float32):
                bound = self.scale_spline / (self.in_features**0.5)
                return jax.random.uniform(key, shape, dtype, -bound, bound)

            self.spline_scaler = self.param(
                "spline_scaler", scaler_init, (self.out_features, self.in_features)
            )

    def scaled_spline_weight(self):
        if self.standalone_scale:
            return self.spline_weight * self.spline_scaler[..., None]
        return self.spline_weight

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.kan_spline import kan_forward

        orig_shape = x.shape
        x2 = x.reshape(-1, self.in_features).astype(jnp.float32)
        # Captured only when "intermediates" is mutable: feeds the adaptive
        # re-gridding hook (Trainer._kan_regrid; reference kan1.py:258-264
        # update_grid=True re-grids from the live inputs).
        self.sow("intermediates", "input", x2)
        # Fused Pallas kernel on TPU (bases stay in VMEM); jnp fallback
        # elsewhere (ops/kan_spline.py).
        out = kan_forward(
            x2, self.grid.value, self.base_weight,
            self.scaled_spline_weight(), self.spline_order,
        ).astype(self.dtype)
        return out.reshape(*orig_shape[:-1], self.out_features)

    def regularization_loss(self, reg_activation=1.0, reg_entropy=1.0):
        """Mean-|w| L1 proxy + entropy (reference kan1.py:216-236)."""
        l1 = jnp.abs(self.spline_weight).mean(-1)
        act = l1.sum()
        p = l1 / (act + 1e-12)
        ent = -jnp.sum(p * jnp.log(p + 1e-12))
        return reg_activation * act + reg_entropy * ent


class KAN(nn.Module):
    """Stack of KANLinear layers (reference KAN1, kan1.py:239-289)."""

    layers_hidden: Sequence[int] = (768, 512, 256)
    grid_size: int = 5
    spline_order: int = 3
    scale_noise: float = 0.1
    scale_base: float = 1.0
    scale_spline: float = 1.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for i, (fin, fout) in enumerate(zip(self.layers_hidden, self.layers_hidden[1:])):
            x = KANLinear(
                fin,
                fout,
                grid_size=self.grid_size,
                spline_order=self.spline_order,
                scale_noise=self.scale_noise,
                scale_base=self.scale_base,
                scale_spline=self.scale_spline,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x)
        return x


def _np_b_splines(x, grid, spline_order):
    """Numpy Cox–de Boor (host math, mirrors b_splines)."""
    import numpy as np

    x = np.asarray(x, np.float32)[..., None]  # (batch, in, 1)
    g = np.asarray(grid, np.float32)[None]  # (1, in, n_pts)
    bases = ((x >= g[..., :-1]) & (x < g[..., 1:])).astype(np.float32)
    for k in range(1, spline_order + 1):
        left = (x - g[..., : -(k + 1)]) / (g[..., k:-1] - g[..., : -(k + 1)])
        right = (g[..., k + 1 :] - x) / (g[..., k + 1 :] - g[..., 1:-k])
        bases = left * bases[..., :-1] + right * bases[..., 1:]
    return bases


def kan_update_grid(params, kan_state, x, layer_path, *, grid_size=5, spline_order=3,
                    grid_eps=0.02, margin=0.01):
    """Functional adaptive re-gridding (reference kan1.py:167-214).

    Returns (new_params, new_kan_state) with the layer's grid moved toward
    the empirical input distribution and spline_weight refit (batched
    pseudo-inverse lstsq) so the layer's function is preserved. Host numpy
    throughout — this runs between jitted steps; op-by-op device dispatch
    would dominate (per-dispatch RPC to the TPU is ~30-40ms).
    """
    import flax
    import numpy as np

    p = flax.traverse_util.flatten_dict(params, sep="/")
    s = flax.traverse_util.flatten_dict(kan_state, sep="/")
    pre = f"{layer_path}/" if layer_path else ""
    grid = np.asarray(s[f"{pre}grid"], np.float32)
    spline_w = p[f"{pre}spline_weight"]
    spline_w_np = np.asarray(spline_w, np.float32)
    scaler = p.get(f"{pre}spline_scaler")
    scaler_np = None if scaler is None else np.asarray(scaler, np.float32)

    x = np.asarray(x, np.float32).reshape(-1, grid.shape[0])
    batch = x.shape[0]
    splines = _np_b_splines(x, grid, spline_order)  # (batch, in, coeff)
    coeff = spline_w_np * (scaler_np[..., None] if scaler_np is not None else 1.0)
    unreduced = np.einsum("bic,oic->bio", splines, coeff)  # (batch, in, out)

    x_sorted = np.sort(x, axis=0)
    idx = np.linspace(0, batch - 1, grid_size + 1).astype(np.int32)
    grid_adaptive = x_sorted[idx]  # (G+1, in)
    step = (x_sorted[-1] - x_sorted[0] + 2 * margin) / grid_size
    grid_uniform = (
        np.arange(grid_size + 1, dtype=np.float32)[:, None] * step + x_sorted[0] - margin
    )
    new_core = grid_eps * grid_uniform + (1 - grid_eps) * grid_adaptive
    lo = new_core[:1] - step * np.arange(spline_order, 0, -1, dtype=np.float32)[:, None]
    hi = new_core[-1:] + step * np.arange(1, spline_order + 1, dtype=np.float32)[:, None]
    new_grid = np.concatenate([lo, new_core, hi], axis=0).T  # (in, n_pts)

    # batched lstsq: sol_i = pinv(A_i) @ B_i per input feature
    A = _np_b_splines(x, new_grid, spline_order).transpose(1, 0, 2)  # (in, batch, C)
    B = unreduced.transpose(1, 0, 2)  # (in, batch, out)
    sol = np.linalg.pinv(A) @ B  # (in, C, out)
    new_coeff = sol.transpose(2, 0, 1)  # (out, in, C)
    if scaler_np is not None:
        new_coeff = new_coeff / np.where(
            np.abs(scaler_np[..., None]) < 1e-8, 1.0, scaler_np[..., None]
        )
    p[f"{pre}spline_weight"] = jnp.asarray(
        new_coeff, getattr(spline_w, "dtype", jnp.float32)
    )
    s[f"{pre}grid"] = jnp.asarray(new_grid)
    return (
        flax.traverse_util.unflatten_dict(p, sep="/"),
        flax.traverse_util.unflatten_dict(s, sep="/"),
    )


class GroupKANLinear(nn.Module):
    """Grouped-KAN linear: per-group learnable spline activation + Dense.

    Channels are split into num_groups; all channels in a group share one
    learnable activation phi_g(x) = w_base * act(x) + sum_j c_gj B_j(x),
    followed by a Dense(in->out) and dropout. Capability parity with
    `ikan.GroupKAN.GroupKANLinear(in, out, act_mode, drop, num_groups)`
    (reference modules/heads.py:124-139).
    """

    in_features: int
    out_features: int
    num_groups: int = 8
    act_mode: str = "gelu"
    drop: float = 0.0
    grid_size: int = 8
    spline_order: int = 3
    grid_range: tuple = (-4.0, 4.0)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.in_features % self.num_groups != 0:
            raise ValueError("num_groups must divide in_features")
        G, K = self.grid_size, self.spline_order
        n_coeff = G + K
        grid = make_grid(1, G, K, self.grid_range)[0]  # shared 1-D grid
        coeff = self.param(
            "act_coeff",
            nn.initializers.normal(0.1 / G),
            (self.num_groups, n_coeff),
        )
        w_base = self.param("act_base", nn.initializers.ones, (self.num_groups,))

        act_fn = {"gelu": nn.gelu, "silu": nn.silu, "relu": nn.relu, "identity": lambda v: v}[
            self.act_mode
        ]
        orig_shape = x.shape
        x2 = x.reshape(-1, self.in_features).astype(jnp.float32)
        # bases: (batch, in, n_coeff) on the shared grid
        bases = b_splines(x2, jnp.tile(grid[None], (self.in_features, 1)), K)
        per_channel_coeff = jnp.repeat(coeff, self.in_features // self.num_groups, axis=0)
        per_channel_base = jnp.repeat(w_base, self.in_features // self.num_groups, axis=0)
        phi = per_channel_base[None] * act_fn(x2) + jnp.einsum(
            "bic,ic->bi", bases, per_channel_coeff
        )
        phi = nn.Dropout(self.drop)(phi.astype(self.dtype), deterministic=deterministic)
        out = nn.Dense(self.out_features, dtype=self.dtype, name="linear")(phi)
        return out.reshape(*orig_shape[:-1], self.out_features)
