"""CLI: `python -m hept_tpu.pileup_trainer -m hept [-c config.yaml]`.

Mirrors reference src/pileup_trainer.py:171-181.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from .train.config import load_config
from .train.trainer import run_one_seed
from .utils.logging import log

CONFIG_DIR = Path(__file__).parent / "configs" / "pileup"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", default="hept")
    ap.add_argument("-c", "--config", default=None)
    ap.add_argument("--dataset", default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--device", default=None, help="cpu | tpu (default backend)")
    args = ap.parse_args()

    path = args.config or CONFIG_DIR / f"pileup_trans_{args.model}.yaml"
    overrides = {}
    if args.dataset:
        overrides["dataset_name"] = args.dataset
    if args.epochs:
        overrides["num_epochs"] = args.epochs
    if args.device:
        overrides["device"] = args.device
    cfg = load_config(path, task="pileup", **overrides)
    results = run_one_seed(cfg)
    log("final test metrics:", results)


if __name__ == "__main__":
    main()
