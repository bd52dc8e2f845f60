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
    convert_convnext_torchvision,
    convert_resnet,
    convert_resnet_classifier,
    load_torch_state_dict,
)


def convert(kind: str, sd, *, backbone: str = "resnet18", variant: str = "base",
            num_layers: int = 12, dest: str = ""):
    """Returns {params, batch_stats} trees nested under `dest` (slash path)."""
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
        params = convert_convnext_torchvision(sd, variant)
        stats = {}
    else:
        raise ValueError(f"unknown kind: {kind}")

    for part in reversed([p for p in dest.split("/") if p]):
        params = {part: params}
        stats = {part: stats} if stats else {}
    return {"params": params, "batch_stats": stats}


def main(argv=None):
    p = argparse.ArgumentParser(description="torch -> mdhs_tpu weight conversion")
    p.add_argument("--kind", required=True,
                   choices=["resnet", "resnet_classifier", "bert", "convnext"])
    p.add_argument("--input", required=True, help=".pth/.bin/.safetensors file")
    p.add_argument("--output", required=True, help="output .msgpack checkpoint")
    p.add_argument("--backbone", default="resnet18")
    p.add_argument("--variant", default="base")
    p.add_argument("--num_layers", type=int, default=12)
    p.add_argument("--dest", default="",
                   help="slash-separated subtree to nest under, e.g. "
                        "'image_encoder' or 'text_encoder'")
    args = p.parse_args(argv)
    sd = load_torch_state_dict(args.input)
    state = convert(args.kind, sd, backbone=args.backbone, variant=args.variant,
                    num_layers=args.num_layers, dest=args.dest)
    save_checkpoint(args.output, state)
    n = len(sd)
    print(f"converted {n} torch tensors -> {args.output}")


if __name__ == "__main__":
    main()
