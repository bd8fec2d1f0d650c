#!/usr/bin/env python3
"""Train the RefineNet residual refiner (reference: refinenet/train_refinenet.py).

    python refinenet/train_refinenet.py [config.json ...] --dataroot DATA.h5 \
        --distances_and_indices DIST.h5 --segmentations_train SEGS.h5 \
        --segmentations_generative SEGS_GEN.h5 --segmentations_sequence SEGS_SEQ.h5
"""
import logging
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from seg2eye_tpu.utils.platform import configure_from_env  # noqa: E402

configure_from_env()

from seg2eye_tpu.data.loader import DataLoader, subsample  # noqa: E402
from seg2eye_tpu.refinenet.config import RefineNetConfig   # noqa: E402
from seg2eye_tpu.refinenet.dataset import RefineNetDataset  # noqa: E402
from seg2eye_tpu.refinenet.model import RefineNetModel     # noqa: E402
from seg2eye_tpu.refinenet.training import default_mesh, main_loop  # noqa: E402

logging.basicConfig(level=logging.INFO)

if __name__ == "__main__":
    cfg = RefineNetConfig.from_args()
    train_loader = DataLoader(RefineNetDataset(cfg, "train"),
                              batch_size=cfg.batch_size, shuffle=True,
                              drop_last=True, seed=cfg.seed,
                              prefetch=cfg.prefetch)
    # periodic test splits are randomly subsampled to test_num_samples
    # (reference refinenet/core/training.py:99-149 init_datasets)
    test_data = {
        "val": DataLoader(subsample(RefineNetDataset(cfg, "validation"),
                                    cfg.test_num_samples, cfg.seed),
                          batch_size=cfg.test_batch_size, shuffle=False,
                          drop_last=False, prefetch=cfg.prefetch),
        "val/pick1": DataLoader(subsample(RefineNetDataset(cfg, "validation",
                                                           pick1=True),
                                          cfg.test_num_samples, cfg.seed),
                                batch_size=cfg.test_batch_size, shuffle=False,
                                drop_last=False, prefetch=cfg.prefetch),
    }
    model = RefineNetModel(cfg)
    result = main_loop(model, cfg, train_loader, test_data,
                       loss_key="eds_loss", model_name="RefineNet",
                       mesh=default_mesh(cfg))
    print("output_dir:", result["output_dir"])
