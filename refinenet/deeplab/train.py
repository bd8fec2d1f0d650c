"""Generic DeepLabV3+ trainer CLI (VOC / SBD / COCO / Cityscapes).

Same invocation surface as the reference refinenet/deeplab/train.py:178-303:

    python refinenet/deeplab/train.py --dataset pascal --backbone resnet \
        [--epochs N] [--batch-size N] [--lr LR] [--loss-type ce|focal] \
        [--use-balanced-weights] [--resume CKPT] [--ft] [--no-val] ...

plus --data-root (replacing the reference's hardcoded mypath.py paths).
--no-cuda forces the CPU backend (the reference's CUDA toggle,
train.py:229-230); otherwise whatever accelerator jax finds is used and
data parallelism engages automatically when the batch divides the devices.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

if __name__ == "__main__":
    if "--no-cuda" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        from seg2eye_tpu.utils.platform import configure_from_env
        configure_from_env()

    from seg2eye_tpu.segtrain.trainer import main

    main()
