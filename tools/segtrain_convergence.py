#!/usr/bin/env python3
"""Convergence evidence for the generic segmentation trainer (SURVEY R13).

Builds a learnable synthetic VOC-layout dataset (rectangles whose fill color
deterministically encodes their class, so color -> class is the target
function), trains `seg2eye_tpu.segtrain.SegTrainer` for a few epochs on the
virtual CPU mesh, and records the train-loss / val-mIoU trajectory:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/segtrain_convergence.py --epochs 8 \
        --out evidence/segtrain_convergence.jsonl

A rising mIoU over epochs demonstrates the full train->validate->best-ckpt
loop (reference refinenet/deeplab/train.py:93-176) learns end-to-end, not
just that single steps run.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))

import numpy as np  # noqa: E402


N_CLASSES_USED = 6   # background + 5 foreground colors


def make_learnable_voc(root: str, n_train: int, n_val: int, h: int = 40,
                       w: int = 40, seed: int = 0) -> None:
    """VOC tree where images render their own labels: class c regions are
    filled with the pascal palette color of c plus small noise."""
    from PIL import Image
    from seg2eye_tpu.segtrain.colormap import PASCAL_LABELS
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "VOCdevkit", "VOC2012")
    os.makedirs(os.path.join(base, "ImageSets", "Segmentation"),
                exist_ok=True)
    os.makedirs(os.path.join(base, "JPEGImages"), exist_ok=True)
    os.makedirs(os.path.join(base, "SegmentationClass"), exist_ok=True)
    splits = {"train": [f"t{i:03d}" for i in range(n_train)],
              "val": [f"v{i:03d}" for i in range(n_val)]}
    for split, ids in splits.items():
        with open(os.path.join(base, "ImageSets", "Segmentation",
                               split + ".txt"), "w") as f:
            f.write("\n".join(ids))
        for iid in ids:
            label = np.zeros((h, w), np.uint8)
            for _ in range(3):
                c = int(rng.integers(1, N_CLASSES_USED))
                y0, x0 = rng.integers(0, h - 8), rng.integers(0, w - 8)
                dy, dx = rng.integers(8, 20, 2)
                label[y0:y0 + dy, x0:x0 + dx] = c
            img = PASCAL_LABELS[label].astype(np.float32)
            img += rng.normal(0, 8.0, img.shape)
            img = np.clip(img, 0, 255).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(base, "JPEGImages", iid + ".jpg"))
            Image.fromarray(label).save(
                os.path.join(base, "SegmentationClass", iid + ".png"))


def A_args(**overrides):
    """Tiny-config trainer args (shared with tools/multiprocess_segtrain)."""
    class A:
        backbone = "resnet"
        out_stride = 16
        dataset = "pascal"
        use_sbd = False
        workers = 0
        base_size = 40
        crop_size = 32
        sync_bn = False
        freeze_bn = False
        loss_type = "ce"
        epochs = 8
        start_epoch = 0
        batch_size = 8
        test_batch_size = 8
        use_balanced_weights = False
        lr = 0.02
        lr_scheduler = "poly"
        momentum = 0.9
        weight_decay = 5e-4
        nesterov = False
        seed = 1
        resume = None
        checkname = "convergence"
        ft = False
        eval_interval = 1
        no_val = False
        data_root = None
        resnet_layers = (1, 1, 1, 1)
    a = A()
    for k, v in overrides.items():
        setattr(a, k, v)
    return a


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--n-train", type=int, default=64)
    ap.add_argument("--n-val", type=int, default=16)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--workdir", default="/tmp/segtrain_convergence")
    ap.add_argument("--out", default="evidence/segtrain_convergence.jsonl")
    args_cli = ap.parse_args()

    # size-keyed fixture dir: a stale reuse of a different-sized dataset
    # would silently misrepresent the emitted evidence's configuration
    root = os.path.join(args_cli.workdir,
                        f"data_{args_cli.n_train}_{args_cli.n_val}")
    if not os.path.exists(root):
        make_learnable_voc(root, args_cli.n_train, args_cli.n_val)
    os.makedirs(args_cli.workdir, exist_ok=True)
    cwd = os.getcwd()
    out_path = os.path.abspath(args_cli.out)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    from seg2eye_tpu.segtrain.trainer import SegTrainer

    targs = A_args(epochs=args_cli.epochs, batch_size=args_cli.batch_size,
                   test_batch_size=args_cli.batch_size, lr=args_cli.lr,
                   data_root=root)
    os.chdir(args_cli.workdir)        # Saver writes ./run/...
    try:
        trainer = SegTrainer(targs)
        rows = []
        for epoch in range(args_cli.epochs):
            loss = trainer.training(epoch)
            miou = trainer.validation(epoch)
            rows.append({"epoch": epoch, "train_loss": float(loss),
                         "val_miou": float(miou),
                         "val_acc": trainer.evaluator.pixel_accuracy()})
        with open(out_path, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        first, last = rows[0]["val_miou"], rows[-1]["val_miou"]
        best = max(r["val_miou"] for r in rows)
        print(f"\nmIoU epoch0={first:.3f} -> final={last:.3f} "
              f"(best {best:.3f}); wrote {out_path}")
        if best <= first:
            raise SystemExit("no mIoU improvement — trainer not learning")
    finally:
        os.chdir(cwd)


if __name__ == "__main__":
    main()
