#!/usr/bin/env python
"""Ablation eval: full/image_only/text_off (reference run_ablation_eval.py)."""
from mdhs_tpu.cli.run_ablation_eval import main

if __name__ == "__main__":
    main()
