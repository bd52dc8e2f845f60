#!/usr/bin/env python
"""Grad-CAM + feature-rank analysis (reference run_analysis_cli.py)."""
from mdhs_tpu.cli.run_analysis import main

if __name__ == "__main__":
    main()
