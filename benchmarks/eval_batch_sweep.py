#!/usr/bin/env python
"""Eval-throughput batch sweep for the scored bench point.

bench.py's scored value runs at BENCH_BATCH=512 (round-3 measured 512 >
256 once the fused sublayer kernels freed the per-layer f32 score
workspace from HBM). This sweep re-checks the batch choice each round in
both modes — larger batches amortize per-step overhead until the working
set spills; the winner is a pure harness knob (no numerics change, the
model is identical), so if a bigger batch wins it should become the
BENCH_BATCH default.

Usage: python benchmarks/eval_batch_sweep.py [batches...]   (default 512 768 1024)
"""

import sys

sys.path.insert(0, ".")

import numpy as np

import bench


def main():
    batches = [int(b) for b in sys.argv[1:]] or [512, 768, 1024]
    bench.wait_for_backend()
    for fast_math, quant, label in (
        (False, "none", "parity"),
        (True, "int8", "serving"),
    ):
        for b in batches:
            try:
                reps, _ = bench.measure_throughput(
                    fast_math=fast_math, batch=b, quantize=quant
                )
            except Exception as e:  # OOM at some batch is a finding, not a crash
                print(f"{label} b={b}: FAILED {type(e).__name__}: {str(e)[:120]}")
                continue
            print(
                f"{label} b={b}: median {np.median(reps):.1f} img/s "
                f"(min {min(reps):.1f}, max {max(reps):.1f})"
            )


if __name__ == "__main__":
    main()
