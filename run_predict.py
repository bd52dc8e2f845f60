#!/usr/bin/env python
"""Predict -> submission CSV (reference run_predict.py surface)."""
from mdhs_tpu.cli.run_predict import main

if __name__ == "__main__":
    main()
