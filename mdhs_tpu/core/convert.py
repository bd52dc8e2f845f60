"""Torch checkpoint -> Flax parameter converters.

Enables accuracy parity with the reference's pretrained towers
(BASELINE.json "bit-compatible logits"): torchvision ResNet18/34/50,
HF `bert-base-uncased`, torchvision/HF ConvNeXt. Input is a torch
state_dict already loaded into numpy (``{name: np.ndarray}``) — use
``load_torch_state_dict`` which handles .pth/.bin/.safetensors without
needing a GPU torch build.

Layout conventions converted:
- torch conv OIHW  -> flax HWIO
- torch linear (out, in) -> flax kernel (in, out)
- BatchNorm weight/bias/running_mean/running_var -> scale/bias + batch_stats
- HF BERT naming -> mdhs_tpu.models.bert module names
"""

from __future__ import annotations

import logging
from typing import Dict

import numpy as np

log = logging.getLogger(__name__)

Arrays = Dict[str, np.ndarray]


def load_torch_state_dict(path: str) -> Arrays:
    """Load a .pth/.pt/.bin (torch pickle) or .safetensors file to numpy."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in state.items()}


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _lin(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _strip_prefix(sd: Arrays, prefix: str) -> Arrays:
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module.") :]
        if prefix and k.startswith(prefix):
            k = k[len(prefix) :]
        out[k] = v
    return out


# ---------------------------------------------------------------------------
# ResNet (torchvision naming: conv1, bn1, layerX.Y.{conv,bn}Z, downsample.0/1)
# ---------------------------------------------------------------------------

def convert_resnet(sd: Arrays, backbone: str = "resnet18", prefix: str = ""):
    """Returns (params, batch_stats) trees for mdhs_tpu.models.resnet.ResNet."""
    from ..models.resnet import STAGE_SIZES

    sd = _strip_prefix(sd, prefix)
    params: dict = {}
    stats: dict = {}

    def put_conv(flax_name, torch_name):
        params[flax_name] = {"kernel": _conv(sd[f"{torch_name}.weight"])}

    def put_bn(flax_name, torch_name):
        params[flax_name] = {
            "scale": sd[f"{torch_name}.weight"],
            "bias": sd[f"{torch_name}.bias"],
        }
        stats[flax_name] = {
            "mean": sd[f"{torch_name}.running_mean"],
            "var": sd[f"{torch_name}.running_var"],
        }

    put_conv("stem_conv", "conv1")
    put_bn("stem_bn", "bn1")
    is_bottleneck = backbone == "resnet50"
    n_convs = 3 if is_bottleneck else 2
    for stage, n_blocks in enumerate(STAGE_SIZES[backbone]):
        for b in range(n_blocks):
            base = f"layer{stage + 1}.{b}"
            fbase = f"layer{stage + 1}_block{b}"
            blk_p: dict = {}
            blk_s: dict = {}
            for ci in range(1, n_convs + 1):
                blk_p[f"conv{ci}"] = {"kernel": _conv(sd[f"{base}.conv{ci}.weight"])}
                blk_p[f"bn{ci}"] = {
                    "scale": sd[f"{base}.bn{ci}.weight"],
                    "bias": sd[f"{base}.bn{ci}.bias"],
                }
                blk_s[f"bn{ci}"] = {
                    "mean": sd[f"{base}.bn{ci}.running_mean"],
                    "var": sd[f"{base}.bn{ci}.running_var"],
                }
            if f"{base}.downsample.0.weight" in sd:
                blk_p["downsample_conv"] = {
                    "kernel": _conv(sd[f"{base}.downsample.0.weight"])
                }
                blk_p["downsample_bn"] = {
                    "scale": sd[f"{base}.downsample.1.weight"],
                    "bias": sd[f"{base}.downsample.1.bias"],
                }
                blk_s["downsample_bn"] = {
                    "mean": sd[f"{base}.downsample.1.running_mean"],
                    "var": sd[f"{base}.downsample.1.running_var"],
                }
            params[fbase] = blk_p
            stats[fbase] = blk_s
    return params, stats


def convert_resnet_classifier(sd: Arrays, backbone: str = "resnet50",
                              fc_key: str = "fc", prefix: str = ""):
    """torchvision resnet with replaced fc (MIBF image branch,
    reference mibf_net/model_resnet.py:15-17) -> ResNetClassifier trees."""
    sd = _strip_prefix(sd, prefix)
    trunk_p, trunk_s = convert_resnet(sd, backbone)
    params = {"trunk": trunk_p}
    if f"{fc_key}.weight" in sd:
        params["fc"] = {
            "kernel": _lin(sd[f"{fc_key}.weight"]),
            "bias": sd[f"{fc_key}.bias"],
        }
    return params, {"trunk": trunk_s}


# ---------------------------------------------------------------------------
# BERT (HF naming)
# ---------------------------------------------------------------------------

def convert_bert(sd: Arrays, num_layers: int = 12, prefix: str = "bert."):
    """HF BertModel state_dict -> mdhs_tpu.models.bert.BertModel params.

    Also returns the pooler params if present (for BertWithPooler).
    """
    sd = _strip_prefix(sd, "")
    # accept either "bert.embeddings..." or "embeddings..." roots
    if not any(k.startswith(prefix) for k in sd):
        prefix = ""
    g = lambda k: sd[prefix + k]

    params: dict = {
        "word_embeddings": {"embedding": g("embeddings.word_embeddings.weight")},
        "position_embeddings": {"embedding": g("embeddings.position_embeddings.weight")},
        "token_type_embeddings": {"embedding": g("embeddings.token_type_embeddings.weight")},
        "embeddings_layernorm": {
            "scale": g("embeddings.LayerNorm.weight"),
            "bias": g("embeddings.LayerNorm.bias"),
        },
    }
    for i in range(num_layers):
        base = f"encoder.layer.{i}."
        params[f"layer_{i}"] = {
            "attention": {
                "query": {
                    "kernel": _lin(g(base + "attention.self.query.weight")),
                    "bias": g(base + "attention.self.query.bias"),
                },
                "key": {
                    "kernel": _lin(g(base + "attention.self.key.weight")),
                    "bias": g(base + "attention.self.key.bias"),
                },
                "value": {
                    "kernel": _lin(g(base + "attention.self.value.weight")),
                    "bias": g(base + "attention.self.value.bias"),
                },
            },
            "attention_output": {
                "kernel": _lin(g(base + "attention.output.dense.weight")),
                "bias": g(base + "attention.output.dense.bias"),
            },
            "attention_layernorm": {
                "scale": g(base + "attention.output.LayerNorm.weight"),
                "bias": g(base + "attention.output.LayerNorm.bias"),
            },
            "intermediate": {
                "kernel": _lin(g(base + "intermediate.dense.weight")),
                "bias": g(base + "intermediate.dense.bias"),
            },
            "output": {
                "kernel": _lin(g(base + "output.dense.weight")),
                "bias": g(base + "output.dense.bias"),
            },
            "output_layernorm": {
                "scale": g(base + "output.LayerNorm.weight"),
                "bias": g(base + "output.LayerNorm.bias"),
            },
        }
    pooler = None
    if prefix + "pooler.dense.weight" in sd:
        pooler = {
            "kernel": _lin(g("pooler.dense.weight")),
            "bias": g("pooler.dense.bias"),
        }
    return params, pooler


# ---------------------------------------------------------------------------
# torch nn.MultiheadAttention -> mdhs_tpu.modules.attention.MultiHeadAttention
# ---------------------------------------------------------------------------

def convert_torch_mha(sd: Arrays, prefix: str = "", embed_dim: int | None = None):
    """Handles both packings: in_proj_weight (3E, E) when q/k/v dims match,
    or separate {q,k,v}_proj_weight (the kdim/vdim variant the reference
    uses for text cross-attention, fusion_blocks.py:25-32)."""
    sd = _strip_prefix(sd, prefix)
    if "in_proj_weight" in sd:
        w = sd["in_proj_weight"]
        e = w.shape[1] if embed_dim is None else embed_dim
        qw, kw, vw = w[:e], w[e : 2 * e], w[2 * e :]
        qb, kb, vb = np.split(sd["in_proj_bias"], 3)
    else:
        qw, kw, vw = sd["q_proj_weight"], sd["k_proj_weight"], sd["v_proj_weight"]
        qb, kb, vb = np.split(sd["in_proj_bias"], 3)
    return {
        "q_proj": {"kernel": _lin(qw), "bias": qb},
        "k_proj": {"kernel": _lin(kw), "bias": kb},
        "v_proj": {"kernel": _lin(vw), "bias": vb},
        "out_proj": {
            "kernel": _lin(sd["out_proj.weight"]),
            "bias": sd["out_proj.bias"],
        },
    }


# ---------------------------------------------------------------------------
# ConvNeXt (torchvision naming: features.N...)
# ---------------------------------------------------------------------------

def convert_convnext_torchvision(sd: Arrays, variant: str = "base", prefix: str = ""):
    """torchvision convnext_{base,large}.features -> mdhs_tpu ConvNeXt params.

    torchvision layout: features.0 = stem (conv, LN2d); features.{2,4,6} =
    downsample (LN2d, conv); features.{1,3,5,7} = stages of CNBlocks with
    block.{0 dwconv, 2 LN, 3 pw1, 5 pw2} and layer_scale.
    """
    from ..models.convnext import CONVNEXT_SPECS

    sd = _strip_prefix(sd, prefix)
    if any(k.startswith("features.") for k in sd):
        sd = _strip_prefix(sd, "features.")
    depths, dims = CONVNEXT_SPECS[variant]
    params: dict = {
        "stem_conv": {
            "kernel": _conv(sd["0.0.weight"]),
            "bias": sd["0.0.bias"],
        },
        "stem_norm": {"scale": sd["0.1.weight"], "bias": sd["0.1.bias"]},
    }
    for stage in range(4):
        tv_stage = 1 + 2 * stage
        if stage > 0:
            ds = f"{2 * stage}"
            params[f"ds{stage}_norm"] = {
                "scale": sd[f"{ds}.0.weight"],
                "bias": sd[f"{ds}.0.bias"],
            }
            params[f"ds{stage}_conv"] = {
                "kernel": _conv(sd[f"{ds}.1.weight"]),
                "bias": sd[f"{ds}.1.bias"],
            }
        for b in range(depths[stage]):
            base = f"{tv_stage}.{b}.block"
            params[f"stage{stage}_block{b}"] = {
                "dwconv": {
                    "kernel": _conv(sd[f"{base}.0.weight"]),
                    "bias": sd[f"{base}.0.bias"],
                },
                "norm": {"scale": sd[f"{base}.2.weight"], "bias": sd[f"{base}.2.bias"]},
                "pwconv1": {
                    "kernel": _lin(sd[f"{base}.3.weight"]),
                    "bias": sd[f"{base}.3.bias"],
                },
                "pwconv2": {
                    "kernel": _lin(sd[f"{base}.5.weight"]),
                    "bias": sd[f"{base}.5.bias"],
                },
                "gamma": sd[f"{tv_stage}.{b}.layer_scale"].reshape(-1),
            }
    return params
