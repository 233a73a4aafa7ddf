"""Typed experiment configs with the reference's YAML key surface.

The reference loads plain YAML per (task, model) with keys: seed, model_name,
model_kwargs, loss_name/kwargs, optimizer_name/kwargs, num_epochs, batch_size,
lr_scheduler_name/kwargs (+lr_scheduler_metric), data_dir, dataset_name,
main_metric, mode, resume/only_eval (tracking_trainer.py:198-208 and the
configs/ tree). We mirror those keys into dataclasses with validation and
defaults merging — the "typed dataclass configs" upgrade SURVEY §5 calls for.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Optional

import yaml

from ..models.transformer import TransformerConfig


@dataclasses.dataclass
class ExperimentConfig:
    task: str = "tracking"  # tracking | pileup
    seed: int = 42
    note: str = ""

    model_name: str = "trans_hept"
    model_kwargs: dict = dataclasses.field(default_factory=dict)

    loss_name: str = "infonce"
    loss_kwargs: dict = dataclasses.field(default_factory=dict)

    optimizer_name: str = "adam"
    optimizer_kwargs: dict = dataclasses.field(default_factory=dict)
    num_epochs: int = 10
    batch_size: int = 1

    lr_scheduler_name: Optional[str] = None
    lr_scheduler_kwargs: dict = dataclasses.field(default_factory=dict)
    lr_scheduler_metric: Optional[str] = None

    data_dir: str = "data/"
    dataset_name: str = "synthetic-tracking-1k"
    main_metric: str = "accuracy@0.9"
    mode: str = "max"

    resume: Optional[str] = None
    only_eval: bool = False
    only_flops: bool = False  # print XLA cost analysis and exit (get_model.py:30)
    log_dir: str = "runs/"
    ckpt_every: int = 0  # extra periodic checkpointing (0 = best-only)

    # Device selection (reference `device: cuda:0` key, tracking_trainer.py:113).
    # "cpu" | "tpu" | None (= default backend). Applied via apply_device()
    # before any computation; torch-style "cuda:N" strings map to the default.
    device: Optional[str] = None

    # TPU-specific knobs (no reference counterpart)
    attn_impl: str = "pallas"
    padding_mode: str = "replicate"
    n_devices: Optional[int] = None  # DP width; None = all
    # Head-sharded tensor parallelism (parallel/tp.py): shard the attention
    # heads over this many devices, composed with DP on a 2-D
    # ("data", "heads") mesh. 1 = off. HEPT only; must divide num_heads and
    # n_devices.
    shard_heads: int = 1
    # Hash-sharded (OR-round) intra-event parallelism: shard n_hashes over
    # this many devices, composed with DP and head sharding on a
    # ("data", "hashes", "heads") mesh. 1 = off. HEPT only.
    shard_hashes: int = 1
    # Train-time random supervision-pair augmentation fraction (reference
    # tracking_trainer.py process_data p=0.2; tracking only).
    pair_aug_p: float = 0.2
    # Pack pairs in the 128-window layout and use the windowed MXU pair ops
    # in the InfoNCE loss (ops/pair_ops.py) — replaces XLA element
    # scatter-add in the loss backward. Tracking only.
    windowed_pairs: bool = True
    # "vmap": dense per-event vmap; "flat": concatenate the event batch into
    # one forward with batch-index AND codes (reference example design) —
    # much faster for small events, where the per-sort-call latency floor
    # dominates. HEPT only.
    batch_mode: str = "vmap"
    # Eval batches per device call: the eval loop stacks this many batches
    # and lax.map's the eval step over them, so per-batch dispatch (a tunnel
    # round trip per event at ~100 ms step scales) amortizes 1/eval_chunk
    # and eval wall time stays flat as the dataset grows (VERDICT r3 #9).
    # 1 = one device call per batch. DEFAULT 1: metric-equivalence is proven
    # on CPU (tests/test_train_e2e.py) but the round-4 r12cv2r TPU runs
    # produced garbage eval metrics for a model that CPU re-eval scores at
    # 0.945 (runs/r4, scripts/diag_r12_collapse.py) — chunked TPU eval is
    # opt-in until scripts/diag_tpu_eval.py exonerates the lax.map path on
    # hardware.
    eval_chunk: int = 1
    # End-of-run shape cross-check: re-evaluate the restored best checkpoint
    # a second time at PERTURBED static shapes (n_max + block_size,
    # e_max + 128) and warn when the main metric moves by more than
    # eval_shape_check_tol. Padding is inert, so a real model scores the
    # same at both sizings; a deterministic shape-specific wrong-result in
    # the compiled eval program (ROADMAP round 4 "RE-DIAGNOSED": the
    # r12cv2r TPU eval computed acc 0.149 at one sizing and 0.945 at
    # another, same checkpoint) fails the check. Costs one extra eval
    # compile per run. DEFAULT ON (VERDICT r4 #2: no quotable number may
    # silently ride a corrupted compiled eval); disable for throwaway runs.
    eval_shape_check: bool = True
    eval_shape_check_tol: float = 0.02
    # Compile the eval forward and the loss+metric tail as SEPARATE jit
    # programs (two device calls per batch) instead of one fused program.
    # DEFAULT ON since round 5: the r12cv2r wrong-result was isolated to
    # the FUSED fwd+loss+METRIC XLA:TPU program at specific n_max values
    # (runs/r5/repro_nmax_sweep.log: at n_max=58300 the fused program
    # computes loss 3.81/acc 0.034 from a clean forward — fwd compiled
    # alone is bitwise-correct, fwd+loss without the metric is correct,
    # and SPLITTING restores the correct 0.80/0.132). Fusing the
    # retrieval-metric subgraph miscompiles the shared embedding buffer.
    # Cost: materializing the embeddings between two device calls
    # (~6 MB/event). Set False only to reproduce the compiler bug.
    eval_split_programs: bool = True

    def model_config(self, in_dim: int, coords_dim: int) -> TransformerConfig:
        kw = dict(self.model_kwargs)
        if self.model_name.startswith("trans_"):
            kw.setdefault("attn_type", self.model_name.split("_", 1)[1])
        return TransformerConfig(
            in_dim=in_dim,
            coords_dim=coords_dim,
            task=self.task,
            attn_impl=self.attn_impl,
            padding_mode=self.padding_mode,
            **kw,
        )


def load_config(path: str | Path, **overrides) -> ExperimentConfig:
    """Load a YAML config (reference key surface) into ExperimentConfig."""
    raw = yaml.safe_load(Path(path).read_text()) or {}
    if str(raw.get("device", "")).startswith("cuda"):
        raw.pop("device")  # torch device strings mean "the accelerator" here
    raw.pop("log_tensorboard", None)
    raw.pop("num_threads", None)
    raw.update(overrides)
    known = {f.name for f in dataclasses.fields(ExperimentConfig)}
    unknown = set(raw) - known
    if unknown:
        raise ValueError(f"unknown config keys: {sorted(unknown)}")
    cfg = ExperimentConfig(**raw)
    apply_device(cfg.device)
    return cfg


def apply_device(device: Optional[str]) -> None:
    """Force the JAX platform before any computation runs.

    The env-var route (JAX_PLATFORMS) can be overridden by site-level backend
    registration, so set the config knob explicitly (same mechanism as
    tests/conftest.py).
    """
    if device in (None, "", "tpu"):
        return
    import jax

    jax.config.update("jax_platforms", device)
