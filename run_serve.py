#!/usr/bin/env python
"""Serve predictions from an exported AOT artifact (export -> serve path)."""
from mdhs_tpu.cli.run_serve import main

if __name__ == "__main__":
    main()
