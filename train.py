"""Seg2Eye-TPU training CLI.

Same invocation surface as the reference train.py:

    python train.py --dataroot PATH_TO_H5_FILE --name EXPERIMENT [...]

(reference: train.py — epoch loop with G/D alternating steps, periodic
print/display/save/full-validation, crash-safe final save.)
"""
from seg2eye_tpu.utils.platform import configure_from_env

configure_from_env()

from seg2eye_tpu.options import parse_options            # noqa: E402
from seg2eye_tpu.train.loop import train                 # noqa: E402

if __name__ == "__main__":
    opt = parse_options(is_train=True)
    train(opt)
