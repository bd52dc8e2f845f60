"""Convert reference-style torch checkpoints into mdhs_tpu checkpoints.

Bridges the reference's pretrained towers to this framework (the accuracy
parity path): torchvision ResNet .pth, HF BERT .bin/.safetensors, and
torchvision ConvNeXt state dicts become a partial params tree saved as a
msgpack checkpoint that `Trainer.load_weights` merges tolerantly.

Usage:
  python -m mdhs_tpu.cli.convert_weights \
      --kind resnet --backbone resnet50 --input resnet50.pth \
      --dest image_encoder --output resnet50_mdhs.msgpack
"""

from __future__ import annotations

import argparse

from ..core.checkpoint import save_checkpoint
from ..core.convert import (
    convert_bert,
    convert_connext_full,
    convert_convnext_any,
    convert_resnet,
    convert_resnet_classifier,
    load_torch_state_dict,
)


def convert(kind: str, sd, *, backbone: str = "resnet18", variant: str = "base",
            num_layers: int = 12, dest: str = "", head: str = "linear"):
    """Returns {params, batch_stats[, kan_state]} trees nested under `dest`
    (slash path)."""
    kan_state: dict = {}
    if kind == "resnet":
        params, stats = convert_resnet(sd, backbone)
        params = {"trunk": params}
        stats = {"trunk": stats}
    elif kind == "resnet_classifier":
        params, stats = convert_resnet_classifier(sd, backbone)
    elif kind == "bert":
        params, pooler = convert_bert(sd, num_layers=num_layers)
        params = {"bert": params}
        if pooler is not None:
            params["pooler"] = pooler
        stats = {}
    elif kind == "convnext":
        params = convert_convnext_any(sd, variant)
        stats = {}
    elif kind == "connext_full":
        # Lightning Model4AAAI_MoE / OurClassfierConvnextV2 checkpoints
        # (reference ConNexT/predict.py:53-57)
        params, stats, kan_state = convert_connext_full(
            sd, head=head, convnext_variant=variant, num_bert_layers=num_layers
        )
    else:
        raise ValueError(f"unknown kind: {kind}")

    for part in reversed([p for p in dest.split("/") if p]):
        params = {part: params}
        stats = {part: stats} if stats else {}
        kan_state = {part: kan_state} if kan_state else {}
    out = {"params": params, "batch_stats": stats}
    if kan_state:
        out["kan_state"] = kan_state
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description="torch -> mdhs_tpu weight conversion")
    p.add_argument("--kind", required=True,
                   choices=["resnet", "resnet_classifier", "bert", "convnext",
                            "connext_full"])
    p.add_argument("--input", required=True, help=".pth/.bin/.safetensors file")
    p.add_argument("--output", required=True, help="output .msgpack checkpoint")
    p.add_argument("--backbone", default="resnet18")
    p.add_argument("--variant", default="base")
    p.add_argument("--num_layers", type=int, default=12)
    p.add_argument("--head", default="linear", choices=["linear", "moe"],
                   help="connext_full classifier head to map (fc vs MoE bank)")
    p.add_argument("--dest", default="",
                   help="slash-separated subtree to nest under, e.g. "
                        "'image_encoder' or 'text_encoder'")
    args = p.parse_args(argv)
    sd = load_torch_state_dict(args.input)
    state = convert(args.kind, sd, backbone=args.backbone, variant=args.variant,
                    num_layers=args.num_layers, dest=args.dest, head=args.head)
    save_checkpoint(args.output, state)
    n = len(sd)
    print(f"converted {n} torch tensors -> {args.output}")


if __name__ == "__main__":
    main()
