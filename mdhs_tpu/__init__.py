"""mdhs_tpu — TPU-native multimodal diagnosis framework.

A ground-up JAX/Flax/Pallas rebuild of the capabilities of the reference
PyTorch repo IamJerryXu/Multimodal-Diagnosis-HAM-Spine (image+text medical
diagnosis on HAM10000 / Spine). One unified framework replaces the
reference's three disjoint stacks (baseline / mibf_net / ConNexT):

- ``mdhs_tpu.core``     config system, dtype policy, checkpointing, registries
- ``mdhs_tpu.models``   ResNet18/34/50, BERT, ConvNeXt encoders + the three
                        model families (baseline, MIBF-Net, ConNexT)
- ``mdhs_tpu.modules``  fusion zoo, heads (MLP/residual/attn-pool/KAN),
                        gating, sequence encoders, tabular branch, MoE, Mamba
- ``mdhs_tpu.ops``      Pallas TPU kernels (selective scan) + fused
                        device-side preprocessing / augmentation / TTA
- ``mdhs_tpu.parallel`` jax.sharding mesh setup (dp/tp/ep axes)
- ``mdhs_tpu.data``     host-side dataset join (JSON+CSV), tokenizer, loaders
- ``mdhs_tpu.train``    jitted train/eval steps, losses, optimizers, metrics
- ``mdhs_tpu.analysis`` Grad-CAM and feature-rank analysis
- ``mdhs_tpu.cli``      run_train / run_predict / run_evaluate /
                        run_ablation_eval / run_analysis entry points
"""

import os as _os

# The environment has zero egress; never let HF transformers try to hit the hub.
_os.environ.setdefault("HF_HUB_OFFLINE", "1")
_os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

# Persistent XLA compilation cache: amortizes compiles across processes
# (first compile on TPU is 20-40s; CLI tools and tests re-run constantly).
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _os.path.expanduser("~/.cache/jax"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")

__version__ = "0.1.0"
