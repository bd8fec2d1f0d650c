#!/usr/bin/env python3
"""Predict masks for the unlabeled generative/sequence images with a trained
SegNet, writing per-user stacked predictions to a new H5 — the file the
RefineNet dataset consumes (reference: refinenet/evaluate_segnet.py:107-151).

    python refinenet/evaluate_segnet.py --resume_from OUTPUT_DIR \
        --dataroot DATA.h5 [--image_key images_gen|images_seq] [--splits ...]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from seg2eye_tpu.utils.platform import configure_from_env  # noqa: E402

configure_from_env()

import h5py                                                 # noqa: E402
import jax                                                  # noqa: E402
import numpy as np                                          # noqa: E402

from seg2eye_tpu.data.loader import DataLoader              # noqa: E402
from seg2eye_tpu.refinenet.checkpoint_manager import CheckpointManager  # noqa: E402
from seg2eye_tpu.refinenet.config import RefineNetConfig    # noqa: E402
from seg2eye_tpu.refinenet.segnet_dataset import SegNetEvalDataset  # noqa: E402
from seg2eye_tpu.refinenet.model import SegNetModel         # noqa: E402
from seg2eye_tpu.refinenet.training import Trainer, device_batch  # noqa: E402

if __name__ == "__main__":
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--image_key", default="",
                     help="default: the split's style-image source — "
                          "images_gen (train/validation) or images_ss (test) "
                          "(dataset.py:96-105 consumes predictions for "
                          "exactly those)")
    pre.add_argument("--splits", default="train,validation,test")
    pre.add_argument("--output", default="")
    pre_ns, rest = pre.parse_known_args()
    cfg = RefineNetConfig.from_args(rest)
    assert cfg.resume_from, "--resume_from OUTPUT_DIR required"

    model = SegNetModel(cfg)
    trainer = Trainer(model, cfg, loss_key="ce_loss")
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed))
    step, state = CheckpointManager(cfg.resume_from,
                                    cfg.checkpoints_keep_n
                                    ).load_last_checkpoint(state)
    if step is None:                   # never silently run random weights
        raise SystemExit(
            f"no checkpoint found under '{cfg.resume_from}/checkpoints' — "
            "a random-weights mask H5 would silently poison the downstream "
            "ranking/refiner pipeline; check --resume_from")
    print(f"loaded checkpoint at step {step}")

    out_path = pre_ns.output or os.path.join(
        cfg.resume_from,
        "deeplab_predictions_%s.h5" % time.strftime("%y%m%d_%H%M%S"))
    with h5py.File(out_path, "w") as of:
        for split in pre_ns.splits.split(","):
            key = pre_ns.image_key or (
                "images_ss" if split == "test" else "images_gen")
            ds = SegNetEvalDataset(cfg, split, key)
            if len(ds) == 0:
                continue
            loader = DataLoader(ds, batch_size=cfg.test_batch_size,
                                shuffle=False, drop_last=False,
                                prefetch=cfg.prefetch)
            og = of.create_group(split)
            per_user = {}
            for batch in loader:
                out = trainer.eval_step(state["variables"],
                                        device_batch(batch))
                preds = np.asarray(out["prediction"]).astype(np.uint8)
                for b, pid in enumerate(batch["person_id"]):
                    per_user.setdefault(pid, []).append(preds[b])
            for pid, plist in per_user.items():
                og.create_dataset(pid, data=np.asarray(plist))
                print(f"Stored {len(plist)} entries to {split}/{pid}")
            print(f"Wrote split: {split}")
    print("output:", out_path)
