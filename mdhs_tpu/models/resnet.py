"""ResNet backbones in Flax (NHWC, TPU-native layout).

Capability parity with the reference's torchvision backbones:
- ResNet18/34 tapped at stem/layer1..layer4 for multi-scale tokens and
  Grad-CAM (reference: encoder.py:62-109, scripts/run_analysis.py:126-133)
- ResNet50 trunk + global pool + 768-d projection head for MIBF-Net
  (reference: mibf_net/model_resnet.py:15-17)

Design notes (TPU-first, not a torch translation):
- NHWC layout throughout (XLA:TPU native); weight converters transpose
  torch's NCHW/OIHW if checkpoints are imported.
- Feature maps are returned functionally as a dict of taps; no hooks.
- BatchNorm runs in bf16 activations / f32 statistics. Flax momentum=0.9
  corresponds to torch's momentum=0.1 running-stat update.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from .norm import TorchBatchNorm

ModuleDef = Any


def _conv_out(y):
    """Tag a conv output for the "selective" remat policy (core/remat.py):
    under remat the tagged value is saved and BN/ReLU are recomputed from
    it in the backward. Identity outside a remat context."""
    return checkpoint_name(y, "conv_out")


class BasicBlock(nn.Module):
    """3x3 + 3x3 residual block (ResNet18/34)."""

    filters: int
    strides: int = 1
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = TorchBatchNorm

    @nn.compact
    def __call__(self, x):
        residual = x
        y = _conv_out(self.conv(self.filters, (3, 3), (self.strides, self.strides), name="conv1")(x))
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = _conv_out(self.conv(self.filters, (3, 3), name="conv2")(y))
        y = self.norm(name="bn2")(y)
        if residual.shape != y.shape:
            residual = _conv_out(self.conv(
                self.filters, (1, 1), (self.strides, self.strides), name="downsample_conv"
            )(x))
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 block (ResNet50+, torch v1.5 stride placement)."""

    filters: int
    strides: int = 1
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = TorchBatchNorm
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        y = _conv_out(self.conv(self.filters, (1, 1), name="conv1")(x))
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = _conv_out(self.conv(self.filters, (3, 3), (self.strides, self.strides), name="conv2")(y))
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = _conv_out(self.conv(self.filters * self.expansion, (1, 1), name="conv3")(y))
        y = self.norm(name="bn3")(y)
        if residual.shape != y.shape:
            residual = _conv_out(self.conv(
                self.filters * self.expansion,
                (1, 1),
                (self.strides, self.strides),
                name="downsample_conv",
            )(x))
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


STAGE_SIZES = {
    "resnet18": [2, 2, 2, 2],
    "resnet34": [3, 4, 6, 3],
    "resnet50": [3, 4, 6, 3],
}
BLOCK_CLS = {
    "resnet18": BasicBlock,
    "resnet34": BasicBlock,
    "resnet50": Bottleneck,
}
# Channel count of each tap (layer2/3/4), used by token projections
# (reference: encoder.py:38-42 channels dict; ResNet50 bottleneck x4).
TAP_CHANNELS = {
    "resnet18": {"layer1": 64, "layer2": 128, "layer3": 256, "layer4": 512},
    "resnet34": {"layer1": 64, "layer2": 128, "layer3": 256, "layer4": 512},
    "resnet50": {"layer1": 256, "layer2": 512, "layer3": 1024, "layer4": 2048},
}


class S2DStemConv(nn.Module):
    """7x7/stride-2/pad-3 stem conv computed as space-to-depth + 4x4/stride-1.

    Numerically the same dot products as the plain conv (each output sums the
    same 147 products, plus zero taps from the kernel padding) — only the
    data layout changes: the 3-channel 224^2 input becomes a 12-channel
    112^2 input, which XLA tiles onto the MXU far better than a C_in=3
    strided conv (docs/TRAIN_PERF.md attributes ~23 ms of the train step to
    the HBM/layout-bound ResNet50 stem). Standard TPU practice for exactly
    this stem shape.

    The parameter tree is IDENTICAL to nn.Conv's ({kernel: (7,7,C,64)}), so
    checkpoints, converters, and parity tests are untouched; toggling s2d is
    a pure execution-plan change.
    """

    features: int = 64
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, C, self.features),
            jnp.float32,
        )
        k = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        # input: 2x2 blocks -> channels, packing index = dy*2C + dx*C + c
        xb = x.reshape(B, H // 2, 2, W // 2, 2, C)
        xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
        # kernel: zero-pad 7->8 on the LEFT (tap k' = k+1, so the original
        # pad-3 window becomes an even pad-4 window), then block-decompose
        # with the same (dy, dx, c) packing
        k = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k = k.reshape(4, 2, 4, 2, C, self.features)
        k = k.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * C, self.features)
        # block-space padding (2, 1): left 4px covers the original pad-3
        # (the extra row/col only meets the zero kernel tap), right 2px
        # covers taps up to 2*(out-1)+3
        return jax.lax.conv_general_dilated(
            xb, k, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


def _use_s2d_stem(mode: str, x) -> bool:
    """Resolve the s2d_stem knob: "on" / "off" / "auto" (TPU + even H/W).
    Env MDHS_S2D_STEM overrides the config for A/B measurement."""
    mode = os.environ.get("MDHS_S2D_STEM", mode).lower()
    if mode not in ("on", "off", "auto"):
        raise ValueError(f"s2d_stem={mode!r}: expected on/off/auto")
    H, W = x.shape[1], x.shape[2]
    even = H % 2 == 0 and W % 2 == 0
    if mode == "on":
        return even
    if mode == "off":
        return False
    return even and jax.default_backend() == "tpu"


def _torch_conv(dtype):
    """Conv factory with torch-exact symmetric padding (k//2 per side)."""

    def make(features, kernel_size, strides=(1, 1), name=None):
        pad = [(k // 2, k // 2) for k in kernel_size]
        return nn.Conv(features, kernel_size, strides, padding=pad,
                       use_bias=False, dtype=dtype, name=name)

    return make


class ResNet(nn.Module):
    """ResNet trunk returning all intermediate taps.

    __call__(x, train) -> dict with keys stem, layer1..layer4; each value is
    an NHWC feature map. Callers pool / tokenize as needed.
    """

    backbone: str = "resnet18"
    dtype: jnp.dtype = jnp.bfloat16
    remat: str = "none"  # see core/remat.py; numerics-preserving memory knob
    s2d_stem: str = "auto"  # on|off|auto — space-to-depth stem (S2DStemConv)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        if self.backbone not in STAGE_SIZES:
            raise ValueError(f"Unsupported backbone: {self.backbone}")
        # torch-exact symmetric padding (k//2 each side). XLA's "SAME" pads
        # asymmetrically for strided convs (e.g. (2,3) for 7x7/2), which
        # breaks bit-parity with torchvision at feature-map borders.
        conv = _torch_conv(self.dtype)
        norm = partial(
            TorchBatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )
        block_cls = BLOCK_CLS[self.backbone]
        if self.remat != "none":
            from ..core.remat import remat_policy

            block_cls = nn.remat(block_cls, policy=remat_policy(self.remat))
        stage_sizes = STAGE_SIZES[self.backbone]

        x = x.astype(self.dtype)
        # Stem: 7x7/2 conv + BN + relu + 3x3/2 maxpool (reference encoder.py:63-68).
        # The s2d path computes the same products through a space-to-depth
        # reorganization (identical param tree; see S2DStemConv).
        if _use_s2d_stem(self.s2d_stem, x):
            x = S2DStemConv(features=64, dtype=self.dtype, name="stem_conv")(x)
        else:
            x = conv(64, (7, 7), (2, 2), name="stem_conv")(x)
        x = norm(name="stem_bn")(x)
        x = nn.relu(x)
        # perturb() taps are identity in normal runs; Grad-CAM differentiates
        # w.r.t. them to read activation gradients functionally (no hooks).
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        # tap AFTER maxpool: the reference's stem module ends with maxpool
        # (encoder.py:63-68), and Grad-CAM taps that module's output
        # (run_analysis.py:127)
        x = self.perturb("stem", x)
        taps = {"stem": x}

        widths = [64, 128, 256, 512]
        for i, (n_blocks, width) in enumerate(zip(stage_sizes, widths)):
            for j in range(n_blocks):
                strides = 2 if (i > 0 and j == 0) else 1
                x = block_cls(
                    filters=width,
                    strides=strides,
                    conv=conv,
                    norm=norm,
                    name=f"layer{i + 1}_block{j}",
                )(x)
            x = self.perturb(f"layer{i + 1}", x)
            taps[f"layer{i + 1}"] = x
        return taps


class ResNetClassifier(nn.Module):
    """ResNet trunk + global average pool + Dense head.

    Equivalent of torchvision resnet with a replaced fc, e.g. the MIBF image
    branch resnet50.fc = Linear(2048, 768) (reference mibf_net/model_resnet.py:15-17).
    """

    backbone: str = "resnet50"
    num_outputs: int = 768
    dtype: jnp.dtype = jnp.bfloat16
    remat: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps = ResNet(
            backbone=self.backbone, dtype=self.dtype, remat=self.remat, name="trunk"
        )(x, train)
        pooled = jnp.mean(taps["layer4"], axis=(1, 2))
        out = nn.Dense(self.num_outputs, dtype=self.dtype, name="fc")(pooled)
        return out, taps
