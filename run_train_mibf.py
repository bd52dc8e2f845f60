#!/usr/bin/env python
"""Train MIBF-Net (reference run_train_mibf.py surface)."""
import sys
from mdhs_tpu.cli.run_train import main

if __name__ == "__main__":
    main(sys.argv[1:] + ["--family", "mibf"])
