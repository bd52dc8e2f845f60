#!/usr/bin/env python
"""Export a compiled serving artifact (jax.export StableHLO, weights baked)."""
from mdhs_tpu.cli.export_serving import main

if __name__ == "__main__":
    main()
