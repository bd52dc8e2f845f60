"""Device mesh and sharding setup.

TPU-native replacement for the reference's parallelism surface:
- nn.DataParallel (reference scripts/train.py:221-223)  -> data axis of a Mesh
- DDP/NCCL (reference mibf_net/train_resnet.py:84-134)  -> same data axis;
  multi-host goes through jax.distributed.initialize + the same Mesh
- (new) model axis for tensor-parallel sharding of wide layers and
  expert-parallel placement of MoE experts — absent in the reference but
  required for scaling (SURVEY.md §2.9).

All collectives are emitted by XLA from NamedSharding annotations; there is
no hand-written communication backend.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def data_axis_size(batch_size: int, n_avail: int) -> int:
    """Largest d <= n_avail that divides the batch.

    Plain gcd undershoots (batch 6 on 4 devices should use 3, not gcd=2);
    a batch that doesn't divide across every device runs on the largest
    subset it does divide across (torch DataParallel can't split batch 4
    over 8 GPUs either), leftover devices idle.
    """
    return max((d for d in range(1, n_avail + 1) if batch_size % d == 0), default=1)


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a 2-D (data, model) mesh over the available devices.

    Default layout puts all devices on the data axis (pure DP, which is the
    reference's only parallel strategy). For MoE / tensor-parallel runs pass
    n_model > 1; the data axis is derived as n_devices // n_model.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if n_data is None:
        if n % n_model != 0:
            raise ValueError(f"{n} devices not divisible by n_model={n_model}")
        n_data = n // n_model
    if n_data * n_model != n:
        raise ValueError(f"mesh {n_data}x{n_model} != {n} devices")
    arr = np.asarray(devs).reshape(n_data, n_model)
    return Mesh(arr, axis_names=(DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def global_put(x, sharding: NamedSharding):
    """device_put that also works on multi-process meshes.

    Single-process: plain jax.device_put. Multi-process (the mesh spans
    devices this process cannot address, so device_put would raise): every
    process holds the FULL host value — our multi-process convention, see
    parallel/distributed.py — and make_array_from_callback assembles the
    global jax.Array from each process's addressable slice of it.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def global_put_tree(tree, sharding: NamedSharding):
    return jax.tree_util.tree_map(lambda x: global_put(x, sharding), tree)


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of host arrays onto the mesh, batch-sharded on axis 0
    (scalars like n_valid are replicated)."""
    sh = batch_sharding(mesh)
    rep = replicated(mesh)

    def _put(x):
        return global_put(x, sh if getattr(x, "ndim", 0) >= 1 else rep)

    return jax.tree_util.tree_map(_put, batch)


def param_sharding_rules(path_tuple, value, mesh: Mesh) -> NamedSharding:
    """Sharding rule for a parameter leaf.

    Tensor-parallel layout for the wide layers (BERT FFN, attention QKV
    output features, MoE expert banks) over the model axis; everything else
    replicated. Keys are flax param path components.
    """
    path = "/".join(str(p) for p in path_tuple).lower()
    ndim = getattr(value, "ndim", 0)
    if mesh.shape[MODEL_AXIS] > 1:
        # MoE expert banks: leading expert axis sharded across model axis.
        if "experts" in path and ndim >= 2:
            return NamedSharding(mesh, P(MODEL_AXIS, *([None] * (ndim - 1))))
        # FFN up-projection / QKV: shard output features (last axis).
        if ndim == 2 and any(k in path for k in ("intermediate", "ffn_up", "up_proj")):
            return NamedSharding(mesh, P(None, MODEL_AXIS))
        # FFN down-projection: shard input features.
        if ndim == 2 and any(k in path for k in ("ffn_down", "down_proj")):
            return NamedSharding(mesh, P(MODEL_AXIS, None))
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Apply param_sharding_rules across a flax param pytree."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = flat
    out = []
    for path, leaf in leaves:
        sh = param_sharding_rules(_path_strs(path), leaf, mesh)
        out.append(global_put(leaf, sh))
    return jax.tree_util.tree_unflatten(treedef, out)


def _path_strs(path):
    return tuple(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def opt_state_shardings(opt_shapes, params, mesh: Mesh):
    """Sharding tree for an optax state, mirroring the param placements.

    `jit(tx.init)` does NOT inherit param shardings: Adam/Muon moments are
    `zeros_like(params)` — constants with no data dependence on the sharded
    inputs, so XLA's propagation has nothing to anchor them and they land
    single-device/replicated (silently wasting HBM per chip and breaking
    the TP memory story). Instead we build explicit out_shardings: any
    opt-state leaf whose path SUFFIX + shape matches a param leaf (optax
    moment trees embed the full param tree, e.g.
    `0/mu/<param path...>`) gets that param's sharding; everything else
    (step counts, schedule state) is replicated.
    """
    rep = replicated(mesh)
    by_path = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        by_path[_path_strs(path)] = (leaf.shape, leaf.sharding)
    suffix_lens = sorted({len(k) for k in by_path}, reverse=True)

    leaves, treedef = jax.tree_util.tree_flatten_with_path(opt_shapes)
    out = []
    for path, leaf in leaves:
        sp = _path_strs(path)
        sh = rep
        for L in suffix_lens:
            if len(sp) >= L:
                hit = by_path.get(sp[-L:])
                if hit is not None and hit[0] == tuple(leaf.shape):
                    sh = hit[1]
                    break
        out.append(sh)
    return jax.tree_util.tree_unflatten(treedef, out)
