#!/usr/bin/env python3
"""Train the 4-class eye SegNet (reference: refinenet/train_segnet.py)."""
import logging
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from seg2eye_tpu.utils.platform import configure_from_env  # noqa: E402

configure_from_env()

from seg2eye_tpu.data.loader import DataLoader, subsample  # noqa: E402
from seg2eye_tpu.refinenet.config import RefineNetConfig   # noqa: E402
from seg2eye_tpu.refinenet.segnet_dataset import SegNetDataset  # noqa: E402
from seg2eye_tpu.refinenet.model import SegNetModel        # noqa: E402
from seg2eye_tpu.refinenet.training import default_mesh, main_loop  # noqa: E402

logging.basicConfig(level=logging.INFO)

if __name__ == "__main__":
    cfg = RefineNetConfig.from_args()
    train_loader = DataLoader(SegNetDataset(cfg, "train"),
                              batch_size=cfg.batch_size, shuffle=True,
                              drop_last=True, seed=cfg.seed,
                              prefetch=cfg.prefetch)
    test_data = {
        "val": DataLoader(subsample(SegNetDataset(cfg, "validation"),
                                    cfg.test_num_samples, cfg.seed),
                          batch_size=cfg.test_batch_size, shuffle=False,
                          drop_last=False, prefetch=cfg.prefetch),
    }
    model = SegNetModel(cfg)
    # SegNet trains with momentum 0.9 (reference train_segnet.py:139), not
    # RefineNet's 0.99 (train_refinenet.py:236)
    result = main_loop(model, cfg, train_loader, test_data,
                       loss_key="ce_loss", model_name="MyDeepLab",
                       momentum=0.9, mesh=default_mesh(cfg))
    print("output_dir:", result["output_dir"])
