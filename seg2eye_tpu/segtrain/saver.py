"""Experiment-directory saver with best-run tracking.

Parity notes (reference: refinenet/deeplab/utils/saver.py):
  * run/<dataset>/<checkname>/experiment_<id> with id = last existing + 1
    (saver.py:9-17).  The glob sort is LEXICOGRAPHIC like the reference's:
    with 11+ runs, experiment_9 sorts after experiment_10, so run_id
    collides with an existing dir and its checkpoint.ckpt gets overwritten
    — a faithful reference quirk, kept (documented in PARITY.md; zero-pad
    checknames or use one checkname per experiment to avoid it);
  * save_checkpoint writes checkpoint.ckpt (the torch .pth.tar, here flax
    msgpack bytes); when is_best, best_pred.txt is written and the
    checkpoint is promoted to <directory>/model_best.ckpt only if it beats
    the best_pred.txt of every PREVIOUS experiment run (saver.py:19-42);
  * save_experiment_config writes parameters.txt — including the
    reference's 'datset' key typo, kept verbatim so downstream parsers of
    either tree agree (saver.py:44-60).
"""
from __future__ import annotations

import glob
import os
import shutil
from collections import OrderedDict

import flax.serialization
import jax


class Saver:
    def __init__(self, args):
        self.args = args
        self.directory = os.path.join("run", args.dataset, args.checkname)
        self.runs = sorted(glob.glob(
            os.path.join(self.directory, "experiment_*")))
        run_id = int(self.runs[-1].split("_")[-1]) + 1 if self.runs else 0
        self.experiment_dir = os.path.join(self.directory,
                                           f"experiment_{run_id}")
        os.makedirs(self.experiment_dir, exist_ok=True)

    def save_checkpoint(self, state, is_best: bool,
                        filename: str = "checkpoint.ckpt") -> str:
        """``state``: pytree dict (params/batch_stats/opt/epoch/best_pred)."""
        filename = os.path.join(self.experiment_dir, filename)
        with open(filename, "wb") as f:
            f.write(flax.serialization.to_bytes(jax.device_get(state)))
        if is_best:
            best_pred = float(state["best_pred"])
            with open(os.path.join(self.experiment_dir,
                                   "best_pred.txt"), "w") as f:
                f.write(str(best_pred))
            if self.runs:
                previous_miou = [0.0]
                for run in self.runs:
                    run_id = run.split("_")[-1]
                    path = os.path.join(self.directory,
                                        f"experiment_{run_id}",
                                        "best_pred.txt")
                    if os.path.exists(path):
                        with open(path) as f:
                            previous_miou.append(float(f.readline()))
                if best_pred > max(previous_miou):
                    shutil.copyfile(filename, os.path.join(
                        self.directory, "model_best.ckpt"))
            else:
                shutil.copyfile(filename, os.path.join(
                    self.directory, "model_best.ckpt"))
        return filename

    @staticmethod
    def load_checkpoint(template, path: str):
        """Resume path (train.py:74-87): bytes -> state shaped like
        ``template``.  Static: resuming must work on non-primary hosts,
        which construct no Saver (and no run directory)."""
        if not os.path.isfile(path):
            raise RuntimeError(f"=> no checkpoint found at '{path}'")
        with open(path, "rb") as f:
            return flax.serialization.from_bytes(template, f.read())

    def save_experiment_config(self) -> None:
        p = OrderedDict()
        p["datset"] = self.args.dataset          # reference typo, kept
        p["backbone"] = self.args.backbone
        p["out_stride"] = self.args.out_stride
        p["lr"] = self.args.lr
        p["lr_scheduler"] = self.args.lr_scheduler
        p["loss_type"] = self.args.loss_type
        p["epoch"] = self.args.epochs
        p["base_size"] = self.args.base_size
        p["crop_size"] = self.args.crop_size
        with open(os.path.join(self.experiment_dir, "parameters.txt"),
                  "w") as f:
            for key, val in p.items():
                f.write(f"{key}:{val}\n")
