#!/usr/bin/env python
"""ConNexT prediction shim (reference predict_ConvNext.py surface)."""
import sys
from mdhs_tpu.cli.run_predict import main

if __name__ == "__main__":
    main(sys.argv[1:] + ["--family", "connext"])
