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
from typing import Dict, Optional

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
        if not any(k.startswith("embeddings.") for k in sd):
            raise KeyError(
                f"convert_bert: no '{prefix}*' or 'embeddings.*' keys in the "
                f"state dict (roots: {sorted({k.split('.')[0] for k in sd})[:8]})"
            )
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


def _sub(sd: Arrays, prefix: str) -> Arrays:
    """Subdict of keys under `prefix`, prefix stripped."""
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _dense(sd: Arrays, name: str) -> dict:
    return {"kernel": _lin(sd[f"{name}.weight"]), "bias": sd[f"{name}.bias"]}


def _ln(sd: Arrays, name: str) -> dict:
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


# ---------------------------------------------------------------------------
# Full models: MIBF Resnet50WithOurs and MultimodalBaselineModel
# ---------------------------------------------------------------------------

def convert_mibf_full(sd: Arrays, num_bert_layers: int = 12):
    """Complete `Resnet50WithOurs` state_dict -> (params, batch_stats) for
    mdhs_tpu.models.mibf.MIBFNet.

    Reference layout (mibf_net/model_resnet.py:10-34):
    - text_encoder.bert.* (HF BertModel inside BertEncoder, bert.py:6-13)
    - image_encoder.* (torchvision resnet50, fc replaced by Linear(2048,768))
    - {textbased,imagbased}_cross_attention.to{K,Q,V}_x/to{K,V}_y/to_out
      (MultiHeadCrossAttention_v2, attention.py:47-56)
    - fc / fc_image.{1,3} / fc_text.{1,3} heads (model_resnet.py:22-34)
    - I2Iattention is instantiated but unused in forward -> dropped.
    """
    sd = _strip_prefix(sd, "")
    bert_params, _ = convert_bert(sd, num_layers=num_bert_layers,
                                  prefix="text_encoder.bert.")
    img_params, img_stats = convert_resnet_classifier(
        _sub(sd, "image_encoder."), backbone="resnet50", fc_key="fc"
    )

    def jointkv(tprefix: str) -> dict:
        names = {
            "to_q_x": "toQ_x", "to_k_x": "toK_x", "to_v_x": "toV_x",
            "to_k_y": "toK_y", "to_v_y": "toV_y", "to_out": "to_out",
        }
        return {fl: _dense(sd, f"{tprefix}.{t}") for fl, t in names.items()}

    params = {
        "text_encoder": bert_params,
        "image_encoder": img_params,
        "textbased_cross_attention": jointkv("textbased_cross_attention"),
        "imagbased_cross_attention": jointkv("imagbased_cross_attention"),
        "fc": _dense(sd, "fc"),
        "fc_image_hidden": _dense(sd, "fc_image.1"),
        "fc_image_out": _dense(sd, "fc_image.3"),
        "fc_text_hidden": _dense(sd, "fc_text.1"),
        "fc_text_out": _dense(sd, "fc_text.3"),
    }
    return params, {"image_encoder": img_stats}


def _convert_fusion(sd: Arrays, fusion_type: str) -> dict:
    """fusion.* subtree -> mdhs_tpu.modules.fusion params
    (reference modules/fusion_blocks.py; our registry keys match)."""
    f = fusion_type
    if f == "basic":
        tb = "fusion.transformer_block"
        return {
            "block": {
                "norm1": _ln(sd, f"{tb}.norm1"),
                "attn1": convert_torch_mha(_sub(sd, f"{tb}.attn1.")),
                "norm2": _ln(sd, f"{tb}.norm2"),
                "attn2": convert_torch_mha(_sub(sd, f"{tb}.attn2.")),
                "norm3": _ln(sd, f"{tb}.norm3"),
                "ff_up": _dense(sd, f"{tb}.ff.0"),
                "ff_down": _dense(sd, f"{tb}.ff.3"),
            }
        }
    if f == "multiscale":
        out = {}
        for scale in (2, 3, 4):
            tp = f"fusion.cross_l{scale}"
            out[f"cross_layer{scale}"] = {
                "txt_proj": _dense(sd, f"{tp}.txt_proj"),
                "attn": convert_torch_mha(_sub(sd, f"{tp}.attn.")),
                "norm": _ln(sd, f"{tp}.norm"),
            }
        return out
    if f in ("concat", "weighted_concat"):
        out = {"proj": _dense(sd, "fusion.proj")}
        if f == "weighted_concat":
            out["w_img"] = sd["fusion.w_img"]
            out["w_txt"] = sd["fusion.w_txt"]
        return out
    if f == "hadamard":
        return {
            "img_proj": _dense(sd, "fusion.img_proj"),
            "txt_proj": _dense(sd, "fusion.txt_proj"),
            "norm": _ln(sd, "fusion.norm"),
        }
    if f == "bilinear":
        return {
            "img_proj": _dense(sd, "fusion.img_proj"),
            "txt_proj": _dense(sd, "fusion.txt_proj"),
            "out_proj": _dense(sd, "fusion.out_proj"),
            "norm": _ln(sd, "fusion.norm"),
        }
    raise ValueError(f"no converter for fusion_type={fusion_type}")


def _convert_head(sd: Arrays, classifier_type: str) -> dict:
    """classifier.* subtree -> mdhs_tpu.modules.heads params."""
    c = classifier_type
    if c == "mlp":
        # nn.Sequential(Linear, ReLU, Dropout, Linear) (model.py:193-200)
        return {"fc1": _dense(sd, "classifier.0"), "fc2": _dense(sd, "classifier.3")}
    if c == "residual":
        # ResidualClassifier (modules/heads.py:28-58): project -> ReLU ->
        # ResidualBlock(linear1, linear2 + LN skip) -> classifier
        return {
            "project": _dense(sd, "classifier.project"),
            "res_fc1": _dense(sd, "classifier.res_block.linear1"),
            "res_fc2": _dense(sd, "classifier.res_block.linear2"),
            "res_norm": _ln(sd, "classifier.res_block.norm"),
            "classifier": _dense(sd, "classifier.classifier"),
        }
    raise ValueError(f"no converter for classifier_type={classifier_type}")


def convert_baseline_full(
    sd: Arrays,
    fusion_type: str = "basic",
    classifier_type: str = "mlp",
    backbone: str = "resnet18",
    num_bert_layers: int = 12,
):
    """Complete `MultimodalBaselineModel` state_dict -> (params, batch_stats)
    for mdhs_tpu.models.baseline.MultimodalBaselineModel.

    Reference layout (model.py:60-200):
    - image_encoder.model.* (torchvision resnet) + image_encoder.proj{2,3,4}
    - text_encoder.model.* (HF BertModel)
    - fusion.* per fusion_type (modules/fusion_blocks.py)
    - classifier.* per classifier_type
    - optional tabular_encoder/tabular_fusion and gate subtrees.
    """
    sd = _strip_prefix(sd, "")
    trunk_p, trunk_s = convert_resnet(
        _sub(sd, "image_encoder.model."), backbone=backbone
    )
    img_enc: dict = {"trunk": trunk_p}
    proj_names = {"proj4": "proj_layer4", "proj3": "proj_layer3", "proj2": "proj_layer2"}
    for tname, fname in proj_names.items():
        if f"image_encoder.{tname}.weight" in sd:
            img_enc[fname] = _dense(sd, f"image_encoder.{tname}")

    bert_params, _ = convert_bert(sd, num_layers=num_bert_layers,
                                  prefix="text_encoder.model.")
    params: dict = {
        "image_encoder": img_enc,
        "text_encoder": {"bert": bert_params},
        "fusion": _convert_fusion(sd, fusion_type),
        "classifier": _convert_head(sd, classifier_type),
    }
    # optional tabular branch (model.py:155-166): TabularEncoder
    # Sequential(Linear0, ReLU, Dropout, Linear3) + tabular_fusion.0
    if "tabular_encoder.net.0.weight" in sd:
        params["tabular_encoder"] = {
            "fc1": _dense(sd, "tabular_encoder.net.0"),
            "fc2": _dense(sd, "tabular_encoder.net.3"),
        }
        params["tabular_fc"] = _dense(sd, "tabular_fusion.0")
    # optional gate (modules/gating.py:5-23): fc = Sequential(Linear0,ReLU,Linear2)
    if "gate.fc.0.weight" in sd:
        params["gate"] = {
            "fc1": _dense(sd, "gate.fc.0"),
            "fc2": _dense(sd, "gate.fc.2"),
        }
    # optional sequence_proj / global_local_proj
    if "sequence_proj.weight" in sd:
        params["sequence_proj"] = _dense(sd, "sequence_proj")
    if "global_local_proj.weight" in sd:
        params["global_local_proj"] = _dense(sd, "global_local_proj")
    return params, {"image_encoder": {"trunk": trunk_s}}


# ---------------------------------------------------------------------------
# MambaVision (NVIDIA naming: patch_embed.conv_down.N, levels.I.blocks.J...)
# ---------------------------------------------------------------------------

def convert_mamba_vision(sd: Arrays, variant: str = "T"):
    """NVIDIA MambaVision state_dict -> (params, batch_stats) for
    mdhs_tpu.models.mamba_vision.MambaVision.

    Reference naming (ConNexT/models/block/mamba_vision.py:1464-1962):
    patch_embed.conv_down.{0,1,3,4}; levels.{i}.blocks.{j}.(conv1/norm1/... |
    norm1/mixer/norm2/mlp [+gamma_1/gamma_2]); levels.{i}.downsample.
    reduction.0; norm; head. Depthwise conv1d weights (half, 1, k) -> HIO.
    """
    from ..models.mamba_vision import MAMBA_VISION_SPECS

    sd = _strip_prefix(sd, "")
    spec = MAMBA_VISION_SPECS[variant]
    depths = spec["depths"]
    params: dict = {}
    stats: dict = {}

    def bn(flax_name, tname):
        params[flax_name] = _ln(sd, tname)
        stats[flax_name] = {
            "mean": sd[f"{tname}.running_mean"],
            "var": sd[f"{tname}.running_var"],
        }

    params["patch_embed"] = {
        "conv1": {"kernel": _conv(sd["patch_embed.conv_down.0.weight"])},
        "conv2": {"kernel": _conv(sd["patch_embed.conv_down.3.weight"])},
        "bn1": _ln(sd, "patch_embed.conv_down.1"),
        "bn2": _ln(sd, "patch_embed.conv_down.4"),
    }
    stats["patch_embed"] = {
        "bn1": {"mean": sd["patch_embed.conv_down.1.running_mean"],
                "var": sd["patch_embed.conv_down.1.running_var"]},
        "bn2": {"mean": sd["patch_embed.conv_down.4.running_mean"],
                "var": sd["patch_embed.conv_down.4.running_var"]},
    }

    for i in range(4):
        for j in range(depths[i]):
            t = f"levels.{i}.blocks.{j}"
            if i < 2:
                name = f"s{i}_conv{j}"
                params[name] = {
                    "conv1": {"kernel": _conv(sd[f"{t}.conv1.weight"]),
                              "bias": sd[f"{t}.conv1.bias"]},
                    "conv2": {"kernel": _conv(sd[f"{t}.conv2.weight"]),
                              "bias": sd[f"{t}.conv2.bias"]},
                    "bn1": _ln(sd, f"{t}.norm1"),
                    "bn2": _ln(sd, f"{t}.norm2"),
                }
                if f"{t}.gamma" in sd:
                    params[name]["gamma"] = sd[f"{t}.gamma"]
                stats[name] = {
                    "bn1": {"mean": sd[f"{t}.norm1.running_mean"],
                            "var": sd[f"{t}.norm1.running_var"]},
                    "bn2": {"mean": sd[f"{t}.norm2.running_mean"],
                            "var": sd[f"{t}.norm2.running_var"]},
                }
            else:
                name = f"s{i}_block{j}"
                blk: dict = {
                    "norm1": _ln(sd, f"{t}.norm1"),
                    "norm2": _ln(sd, f"{t}.norm2"),
                    "mlp_up": _dense(sd, f"{t}.mlp.fc1"),
                    "mlp_down": _dense(sd, f"{t}.mlp.fc2"),
                }
                if f"{t}.gamma_1" in sd:
                    blk["gamma_1"] = sd[f"{t}.gamma_1"]
                    blk["gamma_2"] = sd[f"{t}.gamma_2"]
                if f"{t}.mixer.qkv.weight" in sd:  # attention block
                    attn = {"qkv": {"kernel": _lin(sd[f"{t}.mixer.qkv.weight"])},
                            "proj": _dense(sd, f"{t}.mixer.proj")}
                    if f"{t}.mixer.qkv.bias" in sd:
                        attn["qkv"]["bias"] = sd[f"{t}.mixer.qkv.bias"]
                    blk["attn"] = attn
                else:  # mamba mixer
                    blk["mixer"] = {
                        "in_proj": {"kernel": _lin(sd[f"{t}.mixer.in_proj.weight"])},
                        "x_proj": {"kernel": _lin(sd[f"{t}.mixer.x_proj.weight"])},
                        "out_proj": {"kernel": _lin(sd[f"{t}.mixer.out_proj.weight"])},
                        "dt_proj_kernel": _lin(sd[f"{t}.mixer.dt_proj.weight"]),
                        "dt_proj_bias": sd[f"{t}.mixer.dt_proj.bias"],
                        "A_log": sd[f"{t}.mixer.A_log"],
                        "D": sd[f"{t}.mixer.D"],
                        # torch depthwise conv1d (half, 1, k) -> flax HIO (k, 1, half)
                        "conv1d_x": np.transpose(sd[f"{t}.mixer.conv1d_x.weight"], (2, 1, 0)),
                        "conv1d_z": np.transpose(sd[f"{t}.mixer.conv1d_z.weight"], (2, 1, 0)),
                    }
                params[name] = blk
        if f"levels.{i}.downsample.reduction.0.weight" in sd:
            params[f"ds{i + 1}"] = {
                "kernel": _conv(sd[f"levels.{i}.downsample.reduction.0.weight"])
            }
    if "norm.weight" in sd:
        bn("norm", "norm")
    if "head.weight" in sd:
        params["head"] = _dense(sd, "head")
    return params, stats


# ---------------------------------------------------------------------------
# ConvNeXt (HF naming: embeddings / encoder.stages.N...)
# ---------------------------------------------------------------------------

def convert_convnext_hf(sd: Arrays, variant: str = "base", prefix: str = ""):
    """HF `ConvNextModel` (transformers naming) -> mdhs_tpu ConvNeXt params.

    The reference's primary image tower is
    `ConvNextForImageClassification.from_pretrained(...).convnext`
    (ConNexT/models/ourmodel.py:41-46) whose state dict uses
    `embeddings.patch_embeddings` / `embeddings.layernorm` /
    `encoder.stages.{i}.downsampling_layer.{0,1}` /
    `encoder.stages.{i}.layers.{j}.{dwconv,layernorm,pwconv1,pwconv2,
    layer_scale_parameter}`. The final `layernorm` only feeds HF's
    pooler_output; the reference consumes `last_hidden_state`
    (ourmodel.py:74), so it is intentionally dropped here.
    """
    from ..models.convnext import CONVNEXT_SPECS

    sd = _strip_prefix(sd, prefix)
    if any(k.startswith("convnext.") for k in sd):
        sd = _strip_prefix(sd, "convnext.")
    depths, _dims = CONVNEXT_SPECS[variant]
    params: dict = {
        "stem_conv": {
            "kernel": _conv(sd["embeddings.patch_embeddings.weight"]),
            "bias": sd["embeddings.patch_embeddings.bias"],
        },
        "stem_norm": _ln(sd, "embeddings.layernorm"),
    }
    for stage in range(4):
        base = f"encoder.stages.{stage}"
        if stage > 0:
            params[f"ds{stage}_norm"] = _ln(sd, f"{base}.downsampling_layer.0")
            params[f"ds{stage}_conv"] = {
                "kernel": _conv(sd[f"{base}.downsampling_layer.1.weight"]),
                "bias": sd[f"{base}.downsampling_layer.1.bias"],
            }
        for b in range(depths[stage]):
            lb = f"{base}.layers.{b}"
            params[f"stage{stage}_block{b}"] = {
                "dwconv": {
                    "kernel": _conv(sd[f"{lb}.dwconv.weight"]),
                    "bias": sd[f"{lb}.dwconv.bias"],
                },
                "norm": _ln(sd, f"{lb}.layernorm"),
                "pwconv1": _dense(sd, f"{lb}.pwconv1"),
                "pwconv2": _dense(sd, f"{lb}.pwconv2"),
                "gamma": sd[f"{lb}.layer_scale_parameter"].reshape(-1),
            }
    return params


def convert_convnext_any(sd: Arrays, variant: str = "base", prefix: str = ""):
    """Autodetect HF vs torchvision ConvNeXt naming and convert."""
    sd = _strip_prefix(sd, prefix)
    if any("patch_embeddings" in k or "downsampling_layer" in k for k in sd):
        return convert_convnext_hf(sd, variant=variant)
    return convert_convnext_torchvision(sd, variant=variant)


def _conv1x1(sd: Arrays, name: str) -> dict:
    """torch 1x1 Conv2d -> flax nn.Conv params (OIHW -> HWIO)."""
    return {"kernel": _conv(sd[f"{name}.weight"]), "bias": sd[f"{name}.bias"]}


def _convert_kan_bank(sd: Arrays, prefix: str, num_experts: Optional[int] = None):
    """torch `nn.ModuleList` of KAN1 experts (reference moe.py:160 —
    `experts.{e}.layers.{i}.{base_weight,spline_weight,spline_scaler}` +
    `grid` buffer, kan1.py:35-48) -> our vmapped expert bank: the same
    leaves stacked on a leading expert axis (modules/moe.py ExpertBank).

    num_experts=None infers the count from the checkpoint; a mismatch with
    an explicit count raises (silent truncation would load half an expert
    bank against a full-width gate).

    Returns (params_subtree, kan_state_subtree) for the `experts` module.
    """
    n_ckpt = 0
    while f"{prefix}{n_ckpt}.layers.0.base_weight" in sd:
        n_ckpt += 1
    if n_ckpt == 0:
        raise KeyError(f"{prefix}0.layers.0.base_weight")
    if num_experts is None:
        num_experts = n_ckpt
    elif num_experts != n_ckpt:
        raise ValueError(
            f"checkpoint has {n_ckpt} experts under '{prefix}' but the model "
            f"is configured with {num_experts} (model.moe.num_experts)"
        )
    n_layers = 0
    while f"{prefix}0.layers.{n_layers}.base_weight" in sd:
        n_layers += 1
    params: dict = {}
    state: dict = {}
    for i in range(n_layers):
        layer: dict = {
            "base_weight": np.stack(
                [sd[f"{prefix}{e}.layers.{i}.base_weight"] for e in range(num_experts)]
            ),
            "spline_weight": np.stack(
                [sd[f"{prefix}{e}.layers.{i}.spline_weight"] for e in range(num_experts)]
            ),
        }
        if f"{prefix}0.layers.{i}.spline_scaler" in sd:
            layer["spline_scaler"] = np.stack(
                [sd[f"{prefix}{e}.layers.{i}.spline_scaler"] for e in range(num_experts)]
            )
        params[f"layer_{i}"] = layer
        if f"{prefix}0.layers.{i}.grid" in sd:
            state[f"layer_{i}"] = {
                "grid": np.stack(
                    [sd[f"{prefix}{e}.layers.{i}.grid"] for e in range(num_experts)]
                )
            }
    return params, state


def convert_connext_full(
    sd: Arrays,
    head: str = "linear",
    convnext_variant: str = "base",
    num_bert_layers: int = 12,
    moe_num_experts: Optional[int] = None,
    use_mamba_fusion: bool = False,
):
    """Complete ConNexT checkpoint -> (params, batch_stats, kan_state) for
    mdhs_tpu.models.connext.ConNexTClassifier.

    Accepts three key layouts:
    - Lightning `Model4AAAI_MoE` dicts (reference predict.py:53-57): keys
      under `net.net.*` (Model4AAAI_MoE.net = BaseLineConvNeXt_KAN_mamba,
      whose .net = OurClassfierConvnextV2, pl_model_MOE2.py:59-77,111);
      the `state_dict` wrapper is already unwrapped by
      load_torch_state_dict.
    - bare `BaseLineConvNeXt_KAN_mamba` dicts (`net.*`).
    - bare `OurClassfierConvnextV2` dicts (ourmodel.py:34-67).

    Mapped modules (reference ourmodel.py:34-95):
    - text_encoder.bert.* (HF BertModel inside BertEncoder, BERT.py:7-21)
    - image_encoder.* — HF ConvNextModel naming or the torchvision
      `features.*` fallback (ourmodel.py:41-63), autodetected
    - conv (1x1 1024->768 reduce) -> reduce_conv
    - {textbased,imagbased}_cross_attention.{query,key,value}_conv
      (1x1-conv QKV CrossAttention, ourmodel.py:9-31)
    - fc head; or a `moe.*` subtree (w_gate/w_noise + KAN expert bank,
      moe.py:154-169) when head="moe".
    """
    if use_mamba_fusion:
        # the converter maps no mamba_fusion/mamba_fc parameters; proceeding
        # would leave the live head randomly initialized behind a
        # "loaded full pretrained model" log line
        raise ValueError(
            "convert_connext_full cannot import into a mamba-fusion model "
            "(model.mamba_fusion.enabled) — no reference checkpoint for that "
            "head exists; disable mamba fusion or train from scratch"
        )
    sd = _strip_prefix(sd, "")
    # peel the Lightning wrappers: Model4AAAI_MoE.net.net / wrapper.net
    for wrapper in ("net.net.", "net."):
        if any(k.startswith(wrapper + "text_encoder.") for k in sd):
            sd = {k[len(wrapper):]: v for k, v in sd.items() if k.startswith(wrapper)}
            break

    bert_params, _ = convert_bert(sd, num_layers=num_bert_layers,
                                  prefix="text_encoder.bert.")
    img_params = convert_convnext_any(
        _sub(sd, "image_encoder."), variant=convnext_variant
    )
    params: dict = {
        "text_encoder": bert_params,
        "image_encoder": img_params,
        "reduce_conv": _conv1x1(sd, "conv"),
        "textbased_cross_attention": {
            "query_conv": _conv1x1(sd, "textbased_cross_attention.query_conv"),
            "key_conv": _conv1x1(sd, "textbased_cross_attention.key_conv"),
            "value_conv": _conv1x1(sd, "textbased_cross_attention.value_conv"),
        },
        "imagbased_cross_attention": {
            "query_conv": _conv1x1(sd, "imagbased_cross_attention.query_conv"),
            "key_conv": _conv1x1(sd, "imagbased_cross_attention.key_conv"),
            "value_conv": _conv1x1(sd, "imagbased_cross_attention.value_conv"),
        },
    }
    kan_state: dict = {}
    if head == "moe":
        # fail loudly: a missing MoE subtree would otherwise leave the head
        # randomly initialized while the trainer logs a successful load
        if "moe.w_gate" not in sd:
            raise KeyError(
                "head='moe' but no 'moe.w_gate' in the checkpoint "
                f"(peeled keys start with: {sorted({k.split('.')[0] for k in sd})})"
            )
        experts_p, experts_s = _convert_kan_bank(sd, "moe.experts.", moe_num_experts)
        params["moe"] = {
            "w_gate": sd["moe.w_gate"],
            "w_noise": sd["moe.w_noise"],
            "experts": experts_p,
        }
        if experts_s:
            kan_state["moe"] = {"experts": experts_s}
    else:
        if "fc.weight" not in sd:
            raise KeyError(
                "head='linear' but no 'fc.weight' in the checkpoint "
                f"(peeled keys start with: {sorted({k.split('.')[0] for k in sd})})"
            )
        if "moe.w_gate" in sd:
            # legitimate in the reference (the outer module instantiates MoE
            # even when the shipped forward bypasses it, pl_model_MOE2.py),
            # but worth a loud note: the moe subtree is being dropped
            log.warning(
                "checkpoint contains a 'moe.*' subtree but head='linear' — "
                "importing the fc head and discarding the MoE expert bank; "
                "set model.moe.enabled=true if the checkpoint was trained "
                "through the MoE head"
            )
        params["fc"] = _dense(sd, "fc")
    return params, {}, kan_state


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
