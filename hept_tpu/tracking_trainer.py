"""CLI: `python -m hept_tpu.tracking_trainer -m hept [-c config.yaml]`.

Mirrors the reference entry point (src/tracking_trainer.py:198-208): `-m`
selects `configs/tracking/tracking_trans_<model>.yaml`.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from .train.config import load_config
from .train.trainer import run_one_seed
from .utils.logging import log

CONFIG_DIR = Path(__file__).parent / "configs" / "tracking"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", default="hept")
    ap.add_argument("-c", "--config", default=None)
    ap.add_argument("--dataset", default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--device", default=None, help="cpu | tpu (default backend)")
    args = ap.parse_args()

    path = args.config or CONFIG_DIR / f"tracking_trans_{args.model}.yaml"
    overrides = {}
    if args.dataset:
        overrides["dataset_name"] = args.dataset
    if args.epochs:
        overrides["num_epochs"] = args.epochs
    if args.device:
        overrides["device"] = args.device
    cfg = load_config(path, task="tracking", **overrides)
    results = run_one_seed(cfg)
    log("final test metrics:", results)


if __name__ == "__main__":
    main()
