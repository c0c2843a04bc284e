"""Checkpoint / resume via Orbax.

Reference protocol (miscc/utils.py:323-338, trainer.py:121-131,482-485):
`netG_epoch_{E}` kept per snapshot interval; discriminators overwritten as
`*_epoch_last`; `--continue_ckpt E` restores everything and resumes at E.

Improvement over the reference (documented deviation): optimizer state and
BN/spectral statistics are saved too, so resume is exact — the reference
loses Adam moments and restarts the LR schedule.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from cpcsv_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, model_dir: str):
        self.model_dir = os.path.abspath(model_dir)
        os.makedirs(self.model_dir, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.model_dir, name)

    def save(self, state: TrainState, epoch: int):
        """netG per-epoch snapshot + full train state at 'last'."""
        self._ckptr.save(
            self._path(f"netG_epoch_{epoch}"), state.gen.params, force=True
        )
        self._ckptr.save(self._path("train_state_last"), state, force=True)
        with open(self._path("last_epoch.txt"), "w") as f:
            f.write(str(epoch))

    def restore(self, template: TrainState, epoch: Optional[int] = None) -> TrainState:
        """Restore the full state; if `epoch` is given, overwrite generator
        params from that epoch's snapshot (reference --continue_ckpt)."""
        state = self._ckptr.restore(
            self._path("train_state_last"), item=template
        )
        if epoch is not None:
            g_path = self._path(f"netG_epoch_{epoch}")
            if os.path.exists(g_path):
                g_params = self._ckptr.restore(g_path, item=template.gen.params)
                state = state.replace(gen=state.gen.replace(params=g_params))
        return state

    def restore_generator(self, params_template, epoch: int):
        """Load only netG params (reference inference.py:82-89)."""
        return self._ckptr.restore(
            self._path(f"netG_epoch_{epoch}"), item=params_template
        )

    def last_epoch(self) -> Optional[int]:
        p = self._path("last_epoch.txt")
        if os.path.exists(p):
            return int(open(p).read().strip())
        return None

    def available_generator_epochs(self) -> list[int]:
        out = []
        for name in os.listdir(self.model_dir):
            if name.startswith("netG_epoch_"):
                try:
                    out.append(int(name.removeprefix("netG_epoch_")))
                except ValueError:
                    pass
        return sorted(out)
