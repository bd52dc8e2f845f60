"""Rematerialization policies (training-memory knob `training.remat`).

The reference trains at whatever batch fits cuDNN's workspace; on a v5e
chip the binding constraint is HBM for saved activations (MIBF batch 256
OOMs without remat — docs/TRAIN_PERF.md). Remat trades a little recompute
for that memory, letting larger per-chip batches amortize dispatch and
bandwidth-bound ops.

Modes (consumed by BertModel / ResNet / ConvNeXt via their `remat` field):

- "none"       — save everything (current default; fastest backward).
- "selective"  — save conv outputs (tagged ``checkpoint_name(x, "conv_out")``
  in the CNN blocks) and unbatched matmul outputs (the dense projections);
  recompute attention scores/softmax, GELU, LayerNorm, BatchNorm
  normalization and ReLU in the backward. The recompute is VPU-only
  elementwise work plus the (L x L) attention dots, i.e. a
  flash-attention-like memory profile at a few percent extra FLOPs.
- "full"       — save only block/layer boundaries; the backward replays
  each block's full forward (~+1/3 step FLOPs). Maximum memory savings.

All modes are numerics-preserving for the forward pass; the backward
recompute replays identical operations (dropout RNGs are replayed by
flax's lifted remat), so gradients differ only by fp reassociation noise.
"""

from __future__ import annotations

import jax

VALID_MODES = ("none", "selective", "full")


def remat_policy(mode: str):
    """Map a `training.remat` mode to a jax.checkpoint policy (or None)."""
    if mode == "full":
        return None  # save nothing inside the wrapped block
    if mode == "selective":
        return jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            jax.checkpoint_policies.save_only_these_names("conv_out"),
        )
    raise ValueError(f"remat mode {mode!r}: expected one of {VALID_MODES}")
