"""Checkpointing (orbax): params + optimizer state + iteration, resumable.

Parity target: the fvcore Checkpointer stack (DetectionCheckpointer,
DetectionTSCheckpointer; reference unbias/ubteacher/checkpoint/
detection_checkpoint.py:10-113) — periodic save, ``last_checkpoint`` marker
file, resume_or_load semantics, and teacher/student ensemble layout.
"""
from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


class Checkpointer:
    def __init__(self, output_dir: str):
        self.output_dir = os.path.abspath(output_dir)
        os.makedirs(self.output_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.output_dir, name)

    def save(self, name: str, state: Dict[str, Any]):
        path = self._path(name)
        state = jax.tree_util.tree_map(np.asarray, state)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        with open(os.path.join(self.output_dir, "last_checkpoint"), "w") as f:
            f.write(name)
        logger.info("Saved checkpoint to %s", path)

    def load(self, name: str, target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        path = name if os.path.isabs(name) else self._path(name)
        if target is not None:
            return self._ckptr.restore(path, target)
        return self._ckptr.restore(path)

    def has_checkpoint(self) -> bool:
        return os.path.exists(os.path.join(self.output_dir, "last_checkpoint"))

    def get_last_checkpoint(self) -> Optional[str]:
        marker = os.path.join(self.output_dir, "last_checkpoint")
        if not os.path.exists(marker):
            return None
        with open(marker) as f:
            return f.read().strip()

    def resume_or_load(self, init_state: Dict[str, Any], resume: bool = True) -> Dict[str, Any]:
        """Resume from last_checkpoint when present (restoring iteration and
        optimizer state); otherwise return init_state unchanged — pretrained
        backbone weights are loaded separately by the weight converters."""
        if resume and self.has_checkpoint():
            name = self.get_last_checkpoint()
            logger.info("Resuming from %s", name)
            return self.load(name, init_state)
        return init_state


class PeriodicCheckpointer:
    def __init__(self, checkpointer: Checkpointer, period: int, max_iter: Optional[int] = None):
        self.checkpointer = checkpointer
        self.period = period
        self.max_iter = max_iter

    def step(self, iteration: int, state: Dict[str, Any]):
        it = int(iteration)
        if (it + 1) % self.period == 0:
            self.checkpointer.save(f"model_{it:07d}", state)
        if self.max_iter is not None and it + 1 >= self.max_iter:
            self.checkpointer.save("model_final", state)
