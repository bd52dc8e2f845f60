#!/usr/bin/env python
"""MIBF prediction shim (reference run_predict_mibf_ham.py surface)."""
import sys
from mdhs_tpu.cli.run_predict import main

if __name__ == "__main__":
    main(sys.argv[1:] + ["--family", "mibf"])
