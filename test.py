"""Seg2Eye-TPU evaluation CLI.

Same invocation surface as the reference test.py:

    python test.py --dataroot H5 --name CHECKPOINT_NAME \
        --dataset_key validation|train|test [--load_from_opt_file] [--produce_npy]

validation/train without --produce_npy -> full-dataset MSE eval;
otherwise -> per-image uint8 .npy dump + pred_npy_list.txt manifest
(reference: test.py:13-28).
"""
from seg2eye_tpu.utils.platform import configure_from_env

configure_from_env()

import jax                                               # noqa: E402

from seg2eye_tpu.eval.tester import Tester               # noqa: E402
from seg2eye_tpu.models.pix2pix import Pix2Pix
from seg2eye_tpu.options import parse_options
from seg2eye_tpu.train import state as state_lib
from seg2eye_tpu.utils import checkpoint

if __name__ == "__main__":
    opt = parse_options(is_train=False)
    model = Pix2Pix(opt)
    state = state_lib.create_state(model, jax.random.PRNGKey(opt.seed))
    state = checkpoint.load_state(state, opt, opt.which_epoch, strict=True)
    print(f"loaded '{opt.which_epoch}' checkpoint from {opt.expr_dir}")
    tester = Tester(opt, dataset_key=opt.dataset_key)
    limit = -1 if opt.how_many == float("inf") else int(opt.how_many)
    if opt.dataset_key in ("validation", "train") and not opt.produce_npy:
        tester.run(model, state.variables, mode="full", limit=limit,
                   write_error_log=opt.write_error_log)
    else:
        print("Running inference")
        tester.run_test(model, state.variables, limit=limit)
