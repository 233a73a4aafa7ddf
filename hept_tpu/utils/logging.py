"""Run logging: timestamped stdout + JSONL scalars (+ TensorBoard when the
`tensorboard` package is importable — reference logs TB scalars per phase,
tracking_trainer.py:189-196)."""

from __future__ import annotations

import json
import time
from pathlib import Path


def log(*args):
    print(f"[{time.strftime('%H:%M:%S')}]", *args, flush=True)


class ScalarLogger:
    def __init__(self, run_dir: str | Path):
        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self._f = open(self.run_dir / "scalars.jsonl", "a")
        self._tb = None
        try:  # optional TensorBoard writer
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(str(self.run_dir / "tb"))
        except Exception:
            pass

    def write(self, step: int, scalars: dict, prefix: str = ""):
        rec = {"step": step, **{f"{prefix}{k}": _f(v) for k, v in scalars.items()}}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                try:
                    self._tb.add_scalar(f"{prefix}{k}", _f(v), step)
                except Exception:
                    pass

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def _f(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v
