"""Observability: tensorboard singleton wrapper + Google Sheets logger stub.

Parity notes:
  * Tensorboard wrapper keeps an internal current step
    (refinenet/core/tensorboard.py:8-48).
  * GoogleSheetLogger writes identifier + full-config + per-test rows and
    degrades SILENTLY when credentials are missing
    (refinenet/core/gsheet_logger.py:50-63).  No gspread in this image, so
    the degraded path persists rows to ``gsheet_rows.jsonl`` in the run dir —
    the same information, greppable.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class Tensorboard:
    def __init__(self, output_dir: Optional[str]):
        """``output_dir=None`` constructs a no-op logger (no event file is
        ever opened) — the non-primary-host mode under multi-process DP."""
        self.writer = None
        if output_dir is not None:
            try:
                from tensorboardX import SummaryWriter
                self.writer = SummaryWriter(output_dir)
            except Exception:
                self.writer = None
        self.step = 0

    def update_current_step(self, step: int):
        self.step = step

    def add_scalar(self, tag: str, value):
        if self.writer is not None:
            self.writer.add_scalar(tag, float(np.asarray(value)), self.step)

    def add_image(self, tag: str, img):
        if self.writer is not None:
            self.writer.add_image(tag, np.asarray(img), self.step)

    def close(self):
        if self.writer is not None:
            self.writer.close()


class GoogleSheetLogger:
    """Experiment row tracker; silently degrades to a local JSONL file."""

    def __init__(self, identifier: str, config_json: str, output_dir: str,
                 credentials_path: Optional[str] = None):
        self.identifier = identifier
        self.path = os.path.join(output_dir, "gsheet_rows.jsonl")
        self.ready = False
        self.client = None
        if credentials_path and os.path.exists(credentials_path):
            try:                                     # pragma: no cover
                import gspread  # noqa: F401
                self.ready = True
            except Exception:
                self.ready = False
        os.makedirs(output_dir, exist_ok=True)
        self.update_or_append_row({"Identifier": identifier,
                                   "Config": config_json,
                                   "Start": time.strftime("%c")})

    def update_or_append_row(self, row: Dict) -> None:
        row = {k: (float(np.asarray(v)) if isinstance(
            v, (np.ndarray, np.floating, np.integer)) else v)
            for k, v in row.items()}
        row.setdefault("Identifier", self.identifier)
        try:
            with open(self.path, "a") as f:
                f.write(json.dumps(row, default=str) + "\n")
        except Exception:
            pass                                      # degrade silently
