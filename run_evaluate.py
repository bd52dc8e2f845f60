#!/usr/bin/env python
"""Evaluate accuracy on a labeled test split (reference run_evaluate.py)."""
from mdhs_tpu.cli.run_evaluate import main

if __name__ == "__main__":
    main()
