"""GPipe-style pipeline parallelism over the mesh model axis.

The reference scales with DDP only (mibf_net/train_resnet.py:84-146 wraps
the model in DistributedDataParallel; there is no model partitioning
anywhere in the reference). This module is a beyond-reference scaling
capability for text towers whose layer stack outgrows one chip's HBM:
encoder layers are placed as contiguous blocks across the mesh model axis,
microbatches stream through the stages, and activations hop stage→stage
over ICI via `lax.ppermute` (neighbor exchange — never DCN).

TPU-native formulation: ONE `shard_map` program per device, `lax.scan`
over the pipeline ticks, `jnp.where(stage == 0, fresh_microbatch, recv)`
to inject inputs — no per-stage Python programs, no host scheduler. The
whole schedule is compiled; XLA overlaps each tick's ppermute with the
next tick's stage compute. Differentiable end to end: `ppermute`
transposes to the inverse permutation and `scan` reverses, so `jax.grad`
yields the standard 1F1B-shaped reverse pipeline automatically.

Bubble fraction is the textbook (S-1)/(M+S-1) for S stages and M
microbatches; callers pick M >= 4*S to keep it under ~20%.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def _stack_layers(layer_params: list[Any]):
    """Stack per-layer param pytrees (identical structure) along a new
    leading axis -> scan/shard-friendly (n_layers, ...) leaves."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layer_params)


def pipeline_apply(
    layer_fn: Callable[[Any, Any], Any],
    stacked_params: Any,
    x: jnp.ndarray,
    extras: tuple = (),
    *,
    mesh: Mesh,
    n_microbatches: int,
):
    """Run `n_layers` applications of `layer_fn` as a pipeline over the
    mesh model axis, data-parallel over the mesh data axis.

    Args:
      layer_fn: `(one_layer_params, h, *extras_mb) -> h`. Must be shape
        preserving in `h` (a residual encoder layer). Pure/deterministic —
        the backward replays it under `jax.grad`.
      stacked_params: pytree with leading axis n_layers on every leaf
        (`stack_layer_params`); n_layers must divide by the model-axis
        size. Device s holds the contiguous block of layers
        [s*L/S, (s+1)*L/S) — nothing else ever touches its HBM.
      x: (B, ...) activations; B must divide by
        (data_axis * n_microbatches).
      extras: per-example side inputs that ride along with each
        microbatch (e.g. the attention bias), each (B, ...).
      mesh: the (data, model) mesh from parallel.mesh.make_mesh.
      n_microbatches: M; the pipeline bubble is (S-1)/(M+S-1).

    Returns (B, ...) outputs, batch-sharded over the data axis and
    replicated over the model axis.
    """
    s = dict(mesh.shape)[MODEL_AXIS]
    n_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if n_layers % s:
        raise ValueError(f"{n_layers} layers do not divide over {s} stages")
    if x.shape[0] % (dict(mesh.shape)[DATA_AXIS] * n_microbatches):
        raise ValueError(
            f"batch {x.shape[0]} does not divide over "
            f"data_axis*microbatches = {dict(mesh.shape)[DATA_AXIS]}*{n_microbatches}"
        )

    def per_device(params_blk, x_blk, *extras_blk):
        # params_blk: (L/S, ...) this stage's contiguous layer block.
        # x_blk: (B/data, ...) this data shard's batch.
        stage = jax.lax.axis_index(MODEL_AXIS)
        m = n_microbatches

        def block(h, *ex):
            def body(h, p):
                return layer_fn(p, h, *ex), None

            h, _ = jax.lax.scan(body, h, params_blk)
            return h

        def to_mb(a):
            return a.reshape(m, a.shape[0] // m, *a.shape[1:])

        x_mb = to_mb(x_blk)
        ex_mb = tuple(to_mb(e) for e in extras_blk)
        # in_specs P(DATA_AXIS) makes x/extras *invariant* over the model
        # axis, but the scan carry turns *varying* after the first ppermute
        # hop — mark the initial zeros varying so the carry type is stable
        # (shard_map's varying-manual-axes check).
        vary = lambda a: jax.lax.pcast(a, (MODEL_AXIS,), to="varying")
        zeros_h = vary(jnp.zeros_like(x_mb[0]))
        zeros_ex = tuple(vary(jnp.zeros_like(e[0])) for e in ex_mb)
        fwd = [(i, i + 1) for i in range(s - 1)]  # stage i -> i+1 over ICI

        def tick(carry, t):
            recv_h, recv_ex = carry
            idx = jnp.minimum(t, m - 1)
            inj = lambda fresh, recv: jnp.where(stage == 0, fresh, recv)
            h = inj(x_mb[idx], recv_h)
            ex = tuple(inj(e[idx], r) for e, r in zip(ex_mb, recv_ex))
            out = block(h, *ex)
            # hop to the next stage; the last stage's output leaves the ring
            # (ppermute delivers zeros to stage 0, overwritten by inj above)
            nxt_h = jax.lax.ppermute(out, MODEL_AXIS, fwd)
            nxt_ex = tuple(jax.lax.ppermute(e, MODEL_AXIS, fwd) for e in ex)
            return (nxt_h, nxt_ex), out

        (_, _), outs = jax.lax.scan(
            tick, (zeros_h, zeros_ex), jnp.arange(m + s - 1)
        )
        # outs: (M+S-1, mb, ...); microbatch j completed on the LAST stage
        # at tick j+S-1. Everything the other stages emitted is pipeline
        # scaffolding — mask it out and share the real result over the
        # model axis (psum == broadcast since exactly one stage is nonzero).
        result = outs[s - 1:]
        result = jnp.where(stage == s - 1, result, jnp.zeros_like(result))
        result = jax.lax.psum(result, MODEL_AXIS)
        return result.reshape(x_blk.shape[0], *result.shape[2:])

    extras_specs = tuple(P(DATA_AXIS) for _ in extras)
    return jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS), P(DATA_AXIS)) + extras_specs,
        out_specs=P(DATA_AXIS),
    )(stacked_params, x, *extras)


def stack_layer_params(params: Any, prefix: str, n_layers: int):
    """Collect `{prefix}{i}` subtrees from a flax param dict and stack them
    (bert.py names encoder layers `layer_0..layer_{N-1}`)."""
    return _stack_layers([params[f"{prefix}{i}"] for i in range(n_layers)])


def pipeline_bert(
    variables: Any,
    cfg,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    *,
    mesh: Mesh,
    n_microbatches: int,
    dtype=jnp.bfloat16,
):
    """BertModel forward with the encoder stack pipelined over the mesh
    model axis. Takes the SAME `variables` tree as `BertModel.apply` —
    checkpoints interchange; embeddings/LayerNorm run replicated (tiny),
    the layer stack streams via `pipeline_apply`. Returns the last hidden
    state, (B, L, H), batch-sharded over the data axis.

    The per-layer compute inside the pipeline is the exact XLA BertLayer
    (attention_impl="xla": Pallas sublayer kernels see per-device blocks
    under shard_map and are gated off), so fwd/grad match `BertModel.apply`
    bit-for-bit in f32 (tests/test_sharding.py::test_pipeline_parallel_8cpu).
    """
    from ..models.bert import BertLayer, BertModel

    c = dataclasses.replace(
        cfg, attention_impl="xla", remat="none", sp_mesh_shape=()
    )
    p = variables["params"]

    emb_keys = (
        "word_embeddings", "position_embeddings", "token_type_embeddings",
        "embeddings_layernorm",
    )
    emb_model = BertModel(dataclasses.replace(c, num_hidden_layers=0), dtype=dtype)
    hidden, _ = emb_model.apply(
        {"params": {k: p[k] for k in emb_keys}}, input_ids, attention_mask
    )
    attn_bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -1e9

    stacked = stack_layer_params(p, "layer_", c.num_hidden_layers)
    layer = BertLayer(c, dtype=dtype)

    def layer_fn(lp, h, bias):
        return layer.apply({"params": lp}, h, bias, True)

    return pipeline_apply(
        layer_fn, stacked, hidden, (attn_bias,),
        mesh=mesh, n_microbatches=n_microbatches,
    )
