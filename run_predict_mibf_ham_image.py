#!/usr/bin/env python
"""MIBF prediction shim (reference run_predict_mibf_ham_image.py surface)."""
import sys
from mdhs_tpu.cli.run_predict import main

if __name__ == "__main__":
    # reference variant prints per-class probabilities and macro-OVR AUC
    # against labels (mibf_net/predict_resnet_ham_image.py:69,101-116)
    main(sys.argv[1:] + ["--family", "mibf", "--compute_auc"])
