#!/usr/bin/env python
"""Train the baseline multimodal model (reference run_train.py surface)."""
from mdhs_tpu.cli.run_train import main

if __name__ == "__main__":
    main()
