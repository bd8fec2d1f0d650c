"""Step-numbered checkpoints with retention (parity with
refinenet/core/checkpoint_manager.py: '%07d.ckpt' names, newest
checkpoints_keep_n kept, step recovered from the filename)."""
from __future__ import annotations

import glob
import os
from typing import Optional, Tuple

import flax.serialization
import jax


class CheckpointManager:
    suffix = ".ckpt"

    def __init__(self, output_dir: str, keep_n: int = 3):
        self.dir = os.path.join(output_dir, "checkpoints")
        self.keep_n = keep_n

    def _path(self, step: int) -> str:
        return os.path.join(self.dir, ("%07d" % step) + self.suffix)

    def save_at_step(self, step: int, state) -> str:
        os.makedirs(self.dir, exist_ok=True)
        path = self._path(step)
        with open(path, "wb") as f:
            f.write(flax.serialization.to_bytes(jax.device_get(state)))
        self._retain()
        return path

    def _available(self):
        return sorted(
            (int(os.path.split(fn)[-1].split(".")[0]), fn)
            for fn in glob.glob(os.path.join(self.dir, "*" + self.suffix)))

    def _retain(self):
        available = self._available()
        if len(available) > self.keep_n:
            for step, path in available[:-self.keep_n]:
                os.remove(path)

    def load_last_checkpoint(self, template) -> Tuple[Optional[int], object]:
        """Returns (step, state) or (None, template)."""
        available = self._available()
        if not available:
            return None, template
        step, path = available[-1]
        with open(path, "rb") as f:
            state = flax.serialization.from_bytes(template, f.read())
        return step, state
