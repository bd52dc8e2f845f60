#!/usr/bin/env python
"""Benchmark: per-chip eval throughput, ResNet50+BERT (MIBF-Net) on HAM-shaped data.

Driver-scored metric (BASELINE.json): images/sec/chip for the ResNet50 +
BERT-base eval path with fused device-side preprocessing (uint8 canvas ->
crop/normalize -> forward), plus p50 single-sample predict latency.

Measurement method: K inference steps chained in one jitted lax.scan with
BOTH modalities made loop-variant (defeats XLA loop-invariant code motion,
so every step really runs the full model), hard host fetch between timed
calls. This measures steady-state device throughput the way a pipelined
serving loop would see it.

vs_baseline divisor: the reference's own eval stack is fp32 PyTorch — its
predict/evaluate scripts never enable autocast/fp16 (reference
scripts/predict.py, mibf_net/predict_resnet*.py). On an A100:
BERT-base seq128 fp32 (matmul TF32 off by default in torch>=1.12) ~600
seq/s; ResNet50 (TF32 convs) ~2500 img/s; serially composed ~480 img/s
before DataLoader overhead. We use 500 img/s as a slightly conservative
reference. North star is >=5x.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import time

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax
import jax.numpy as jnp
import numpy as np

from mdhs_tpu.models.bert import BertConfig
from mdhs_tpu.models.mibf import MIBFNet
from mdhs_tpu.ops.preprocess import eval_pipeline

A100_PYTORCH_REF_IPS = 500.0  # see module docstring for the derivation

BATCH = 256
SEQ_LEN = 128
CANVAS = 256
IMAGE_SIZE = 224
NUM_CLASSES = 7
K_STEPS = 8
N_TIMED = 3


def main():
    # fast_math: bf16 softmax + tanh GELU — the framework's serving preset
    # (config knob model.fast_math; exact-parity mode is the default).
    model = MIBFNet(
        num_labels=NUM_CLASSES, bert=BertConfig(fast_math=True), dtype=jnp.bfloat16
    )
    rng = jax.random.PRNGKey(0)
    images_u8 = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (BATCH, CANVAS, CANVAS, 3), np.uint8)
    )
    input_ids = jnp.asarray(
        np.random.default_rng(1).integers(0, 30000, (BATCH, SEQ_LEN), np.int32)
    )
    mask = jnp.ones((BATCH, SEQ_LEN), jnp.int32)

    ex_images = eval_pipeline(images_u8[:2], IMAGE_SIZE, normalize=False)
    variables = jax.jit(
        lambda r: model.init({"params": r}, ex_images, input_ids[:2], mask[:2])
    )(rng)
    variables = {k: v for k, v in variables.items() if k != "perturbations"}

    @jax.jit
    def step_chain(variables, images_u8, input_ids, mask):
        def body(carry, t):
            im = images_u8 + t.astype(jnp.uint8)      # loop-variant: no LICM
            ii = (input_ids + t) % 30000
            images = eval_pipeline(im, IMAGE_SIZE, normalize=False)
            out = model.apply(variables, images, ii, mask)["image_text"]
            return carry + out.sum(), None

        carry, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(K_STEPS))
        return carry

    # compile + warmup
    np.asarray(step_chain(variables, images_u8, input_ids, mask))
    t0 = time.perf_counter()
    for _ in range(N_TIMED):
        np.asarray(step_chain(variables, images_u8, input_ids, mask))
    elapsed = time.perf_counter() - t0
    ips = N_TIMED * K_STEPS * BATCH / elapsed

    # p50 single-sample predict latency (wall, incl. dispatch)
    @jax.jit
    def single(variables, im, ii, am):
        images = eval_pipeline(im, IMAGE_SIZE, normalize=False)
        return model.apply(variables, images, ii, am)["image_text"].argmax(-1)

    s_args = (images_u8[:1], input_ids[:1], mask[:1])
    np.asarray(single(variables, *s_args))
    lats = []
    for _ in range(20):
        t0 = time.perf_counter()
        np.asarray(single(variables, *s_args))
        lats.append(time.perf_counter() - t0)
    p50_ms = float(np.median(lats) * 1000)

    result = {
        "metric": "images/sec/chip (ResNet50+BERT eval on HAM)",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / A100_PYTORCH_REF_IPS, 2),
        "p50_predict_latency_ms": round(p50_ms, 2),
        "batch": BATCH,
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
