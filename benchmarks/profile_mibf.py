#!/usr/bin/env python
"""Where does MIBF eval time go? Tower-by-tower timing on the real chip.

Times (a) BERT-base seq128 alone, (b) ResNet50 @224 alone, (c) the full
MIBFNet, each as a K-step loop-variant lax.scan chain (same LICM-proof
method as bench.py), in both default and fast_math modes. Prints a small
JSON report. Diagnostic only — bench.py remains the scored entry point.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mdhs_tpu.models.bert import BertConfig, BertModel
from mdhs_tpu.models.mibf import MIBFNet
from mdhs_tpu.models.resnet import ResNetClassifier
from mdhs_tpu.ops.preprocess import eval_pipeline

BATCH = int(__import__("os").environ.get("BENCH_BATCH", "256"))
SEQ = 128
CANVAS = 256
SIZE = 224
K = 8
N = 3


def chain_time(fn, *args):
    """Median wall time of N calls of a K-step scan chain, after warmup."""
    np.asarray(fn(*args))
    times = []
    for _ in range(N):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / K


def main():
    rng = jax.random.PRNGKey(0)
    img_u8 = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (BATCH, CANVAS, CANVAS, 3), np.uint8)
    )
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 30000, (BATCH, SEQ), np.int32))
    mask = jnp.ones((BATCH, SEQ), jnp.int32)
    report = {"batch": BATCH, "backend": jax.default_backend()}

    for fast in (False, True):
        tag = "fast" if fast else "default"

        bert = BertModel(BertConfig(fast_math=fast), dtype=jnp.bfloat16)
        bv = jax.jit(lambda r: bert.init(r, ids[:2], mask[:2]))(rng)

        @jax.jit
        def bert_chain(v, ids, mask):
            def body(c, t):
                out, _ = bert.apply(v, (ids + t) % 30000, mask)
                return c + out.sum(), None
            return jax.lax.scan(body, jnp.zeros((), jnp.bfloat16), jnp.arange(K))[0]

        report[f"bert_ms_{tag}"] = round(chain_time(bert_chain, bv, ids, mask) * 1e3, 2)

        resnet = ResNetClassifier(backbone="resnet50", num_outputs=768, dtype=jnp.bfloat16)
        ex = eval_pipeline(img_u8[:2], SIZE, normalize=False)
        rv = jax.jit(lambda r: resnet.init(r, ex))(rng)
        rv = {k: rv[k] for k in ("params", "batch_stats")}

        @jax.jit
        def resnet_chain(v, img):
            def body(c, t):
                x = eval_pipeline(img + t.astype(jnp.uint8), SIZE, normalize=False)
                out, _ = resnet.apply(v, x)
                return c + out.sum(), None
            return jax.lax.scan(body, jnp.zeros((), jnp.bfloat16), jnp.arange(K))[0]

        report[f"resnet_ms_{tag}"] = round(chain_time(resnet_chain, rv, img_u8) * 1e3, 2)

        model = MIBFNet(num_labels=7, bert=BertConfig(fast_math=fast), dtype=jnp.bfloat16)
        mv = jax.jit(lambda r: model.init({"params": r}, ex, ids[:2], mask[:2]))(rng)
        mv = {k: v for k, v in mv.items() if k != "perturbations"}

        @jax.jit
        def full_chain(v, img, ids, mask):
            def body(c, t):
                x = eval_pipeline(img + t.astype(jnp.uint8), SIZE, normalize=False)
                out = model.apply(v, x, (ids + t) % 30000, mask)["image_text"]
                return c + out.sum(), None
            return jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(K))[0]

        report[f"full_ms_{tag}"] = round(
            chain_time(full_chain, mv, img_u8, ids, mask) * 1e3, 2
        )
        report[f"ips_{tag}"] = round(BATCH / (report[f"full_ms_{tag}"] / 1e3), 1)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
