#!/usr/bin/env python3
"""Produce challenge-submission .npy predictions with a trained RefineNet
(reference: refinenet/evaluate_refinenet.py:83-128).

    python refinenet/evaluate_refinenet.py --resume_from OUTPUT_DIR \
        --dataroot ... --distances_and_indices ... \
        --segmentations_generative ... --segmentations_sequence ...
"""
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from seg2eye_tpu.utils.platform import configure_from_env  # noqa: E402

configure_from_env()

import jax                                                  # noqa: E402
import numpy as np                                          # noqa: E402

from seg2eye_tpu.data.loader import DataLoader              # noqa: E402
from seg2eye_tpu.refinenet.checkpoint_manager import CheckpointManager  # noqa: E402
from seg2eye_tpu.refinenet.config import RefineNetConfig    # noqa: E402
from seg2eye_tpu.refinenet.dataset import RefineNetDataset  # noqa: E402
from seg2eye_tpu.refinenet.model import RefineNetModel      # noqa: E402
from seg2eye_tpu.refinenet.training import Trainer, device_batch  # noqa: E402

if __name__ == "__main__":
    cfg = RefineNetConfig.from_args()
    assert cfg.resume_from, "--resume_from OUTPUT_DIR required"
    loader = DataLoader(RefineNetDataset(cfg, "test", pick1=True),
                        batch_size=cfg.test_batch_size, shuffle=False,
                        drop_last=False, prefetch=cfg.prefetch)
    model = RefineNetModel(cfg)
    trainer = Trainer(model, cfg, loss_key="eds_loss")
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed))
    step, state = CheckpointManager(cfg.resume_from,
                                    cfg.checkpoints_keep_n
                                    ).load_last_checkpoint(state)
    if step is None:                   # never silently run random weights
        raise SystemExit(
            f"no checkpoint found under '{cfg.resume_from}/checkpoints' — "
            "submission npys from random weights would be garbage; check "
            "--resume_from")
    print(f"loaded checkpoint at step {step}")
    out_dir = os.path.join(cfg.resume_from, "predictions")
    os.makedirs(out_dir, exist_ok=True)
    filepaths = []
    for i, batch in enumerate(loader):
        out = trainer.eval_step(state["variables"], device_batch(batch))
        # (pred+1)*255/2 uint8 (evaluate_refinenet.py:104-112)
        preds = np.clip((np.asarray(out["prediction"]) + 1.0) * 255.0 / 2.0,
                        0, 255).astype(np.uint8)
        for b, fname in enumerate(batch["fname"]):
            path = os.path.join(out_dir, fname + ".npy")
            np.save(path, preds[b, ..., 0])
            filepaths.append(path)
        if i % 10 == 0:
            print(f"batch {i}: {len(filepaths)} files")
    manifest = os.path.join(out_dir, "pred_npy_list.txt")
    with open(manifest, "w") as f:
        f.write(os.linesep.join(filepaths) + os.linesep)
    print(f"Written {len(filepaths)} files. Filepath: {manifest}")
