"""Training CLI (reference run_train.py / scripts/train.py surface)."""

from __future__ import annotations

import argparse

from .common import build_trainer


def main(argv=None):
    p = argparse.ArgumentParser(description="Train a multimodal diagnosis model")
    p.add_argument("--config", type=str, required=True, help="YAML config path")
    p.add_argument("--family", type=str, default="baseline",
                   choices=["baseline", "mibf", "connext"])
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   help="config override key=value (repeatable)")
    args = p.parse_args(argv)
    # multi-host bootstrap from env (reference DDP surface: RANK/WORLD_SIZE
    # -> init_process_group, mibf_net/train_resnet.py:84-88)
    from ..parallel.distributed import initialize_multihost

    initialize_multihost()
    trainer = build_trainer(args.config, family=args.family, overrides=args.overrides)
    trainer.fit()
    return trainer


if __name__ == "__main__":
    main()
