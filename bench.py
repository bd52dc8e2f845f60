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

Scored value = the DEFAULT exact-parity mode (fast_math=False). The
fast_math serving preset is reported in `serving_preset_ips` but not scored.

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


# Ride out transient TPU outages / libtpu skew before starting the bench
# (r03 tunnel outage, r04 stale-AOT libtpu mismatch). Shared with
# __graft_entry__; probes dispatch in a subprocess, clears the persistent
# compilation cache on a libtpu version mismatch, retries.
from mdhs_tpu.utils.backend import wait_for_backend

SEQ_LEN = 128
CANVAS = 256
IMAGE_SIZE = 224
NUM_CLASSES = 7
K_STEPS = 8
N_TIMED = 5  # >=5 timed repeats: report median + min/max spread (VERDICT r4 #6)

# v5e peak dense bf16 matmul throughput, for the MFU field. Other chips
# fall back to "unknown" rather than a wrong denominator.
PEAK_TFLOPS_BY_KIND = {"TPU v5 lite": 197.0, "TPU v5e": 197.0}


def measure_throughput(fast_math: bool, batch: int, quantize: str = "none"):
    """Steady-state eval throughput for one (mode, batch) point.

    Returns (per-repeat ips list, flops_per_image or None). Each repeat
    times one K_STEPS lax.scan chain with a hard host fetch; the per-image
    FLOP count comes from the compiled executable's own cost analysis (not
    a hand estimate), so mfu_pct in the scored JSON is artifact-grounded."""
    model = MIBFNet(
        num_labels=NUM_CLASSES,
        bert=BertConfig(fast_math=fast_math, quantize=quantize),
        dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    images_u8 = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (batch, CANVAS, CANVAS, 3), np.uint8)
    )
    input_ids = jnp.asarray(
        np.random.default_rng(1).integers(0, 30000, (batch, SEQ_LEN), np.int32)
    )
    mask = jnp.ones((batch, SEQ_LEN), jnp.int32)

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

    # FLOPs/image from the compiled single forward's own cost analysis.
    # (The scan chain is unusable for this: XLA's cost analysis counts the
    # while-loop body ONCE regardless of trip count — measured 3.79 GF/img
    # through the chain vs 30.3 GF/img single-step, an exact 8x = K_STEPS.)
    flops_per_image = None
    try:
        @jax.jit
        def single_step(variables, images_u8, input_ids, mask):
            images = eval_pipeline(images_u8, IMAGE_SIZE, normalize=False)
            return model.apply(variables, images, input_ids, mask)["image_text"]

        ca = single_step.lower(
            variables, images_u8, input_ids, mask
        ).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        if ca and ca.get("flops"):
            flops_per_image = float(ca["flops"]) / batch
    except Exception:
        pass  # cost analysis is best-effort; mfu is omitted if unavailable
    np.asarray(step_chain(variables, images_u8, input_ids, mask))
    ips = []
    for _ in range(N_TIMED):
        t0 = time.perf_counter()
        np.asarray(step_chain(variables, images_u8, input_ids, mask))
        ips.append(K_STEPS * batch / (time.perf_counter() - t0))
    return ips, flops_per_image


def measure_p50_latency(fast_math: bool) -> float:
    """p50 single-sample predict latency in ms (wall, incl. dispatch)."""
    model = MIBFNet(
        num_labels=NUM_CLASSES, bert=BertConfig(fast_math=fast_math), dtype=jnp.bfloat16
    )
    rng = jax.random.PRNGKey(0)
    im = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (1, CANVAS, CANVAS, 3), np.uint8)
    )
    ii = jnp.asarray(np.random.default_rng(1).integers(0, 30000, (1, SEQ_LEN), np.int32))
    am = jnp.ones((1, SEQ_LEN), jnp.int32)

    ex_images = eval_pipeline(im, IMAGE_SIZE, normalize=False)
    variables = jax.jit(lambda r: model.init({"params": r}, ex_images, ii, am))(rng)
    variables = {k: v for k, v in variables.items() if k != "perturbations"}

    @jax.jit
    def single(variables, im, ii, am):
        images = eval_pipeline(im, IMAGE_SIZE, normalize=False)
        return model.apply(variables, images, ii, am)["image_text"].argmax(-1)

    np.asarray(single(variables, im, ii, am))
    lats = []
    for _ in range(20):
        t0 = time.perf_counter()
        np.asarray(single(variables, im, ii, am))
        lats.append(time.perf_counter() - t0)
    return float(np.median(lats) * 1000)


def main():
    wait_for_backend()
    # Scored number: the DEFAULT exact-parity mode (fast_math=False — f32
    # softmax + exact GELU, bit-parity-tested vs HF in
    # tests/test_torch_parity.py). normalize=False matches the MIBF reference
    # pipeline, which has no Normalize (reference dataset_spine.py:62-69).
    # The fast_math serving preset (config knob model.fast_math) is reported
    # alongside, not scored.
    # Batch choice: re-swept each round (benchmarks/eval_batch_sweep.py).
    # r5 on-chip sweep (parity mode, median of 5): 512→4210, 768→4200,
    # 1024→4253, 1536→4218, 2048→4389, 4096→4241 img/s — 2048 is the peak
    # (+4.3% over 512; serving preset peaks there too, 5387 vs 5157) and
    # 4096 spills. The non-monotonic bumps at non-power-of-two batches are
    # tiling/grid effects, not noise (spreads are ±0.3%).
    # Historical note: the r3-era 4392@512 vs r4/r5 ~4205-4231@512 gap is
    # CROSS-SESSION drift (terminal libtpu upgrades between rounds — see
    # MULTICHIP_r04's version-skew error), not a code regression: r4's
    # 4205 reproduced in r5 at 4210-4231 across stem paths.
    batch = int(os.environ.get("BENCH_BATCH", "2048"))
    repeats, flops_per_image = measure_throughput(fast_math=False, batch=batch)
    ips = float(np.median(repeats))
    p50_ms = measure_p50_latency(fast_math=False)
    # Serving preset = fast_math + int8 a8w8 BERT tower (fused Pallas
    # sublayer kernels, ops/quant_kernel.py). Both knobs are opt-in with
    # measured drift documented in docs/PARITY.md; not scored.
    serving_repeats, _ = measure_throughput(fast_math=True, batch=batch,
                                            quantize="int8")
    serving_ips = float(np.median(serving_repeats))

    mfu_pct = None
    kind = jax.devices()[0].device_kind
    peak = PEAK_TFLOPS_BY_KIND.get(kind)
    if flops_per_image and peak:
        mfu_pct = 100.0 * ips * flops_per_image / (peak * 1e12)

    # Training throughput (VERDICT r2 #3): the real Trainer step — fused
    # aug + fwd + bwd + Adam — through benchmarks/train_bench.measure.
    # Guarded: a train-bench failure must not take down the scored eval
    # metric.
    train = {}
    try:
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__) or ".", "benchmarks"))
        import train_bench

        train = train_bench.measure(batch=int(os.environ.get("BENCH_TRAIN_BATCH", "128")))
    except Exception as e:  # pragma: no cover
        train = {"train_error": f"{type(e).__name__}: {e}"[:200]}

    result = {
        "metric": "images/sec/chip (ResNet50+BERT eval on HAM, default parity mode)",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / A100_PYTORCH_REF_IPS, 2),
        "p50_predict_latency_ms": round(p50_ms, 2),
        "repeats_min": round(float(min(repeats)), 1),
        "repeats_max": round(float(max(repeats)), 1),
        "n_repeats": len(repeats),
        "mfu_pct": round(mfu_pct, 1) if mfu_pct is not None else None,
        "flops_per_image_g": (round(flops_per_image / 1e9, 2)
                              if flops_per_image else None),
        "serving_preset_ips": round(serving_ips, 1),
        "serving_repeats_min": round(float(min(serving_repeats)), 1),
        "serving_repeats_max": round(float(max(serving_repeats)), 1),
        "batch": batch,
        "backend": jax.default_backend(),
    }
    result.update({k: v for k, v in train.items() if k != "batch"})
    if "batch" in train:
        result["train_batch"] = train["batch"]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
