"""Options system: CLI parsing, persistence, --load_from_opt_file overlay
(reference: options/base_options.py:68-142)."""
import os

import pytest

from seg2eye_tpu.options import Options, parse_options


def test_parse_defaults_match_reference():
    opt = parse_options([], is_train=True, save=False)
    assert opt.norm_G == "spectralspadebatch3x3"
    assert opt.gan_mode == "hinge"
    assert opt.no_vgg_loss is True          # train_options.py:51
    assert opt.niter == 14 and opt.niter_decay == 7
    assert opt.semantic_nc == opt.label_nc == 4
    assert opt.image_height == 320 and opt.image_width == 256


def test_test_defaults():
    opt = parse_options([], is_train=False, save=False)
    assert opt.serial_batches and opt.no_flip and not opt.isTrain


def test_cli_flags():
    opt = parse_options(["--batchSize", "8", "--ngf", "32", "--no_flip",
                         "--gan_mode", "ls"], is_train=True, save=False)
    assert opt.batchSize == 8 and opt.ngf == 32
    assert opt.no_flip is True and opt.gan_mode == "ls"


def test_save_and_load_from_opt_file(tmp_path):
    opt = parse_options(["--checkpoints_dir", str(tmp_path), "--name", "exp",
                         "--ngf", "24", "--w_dim", "12"],
                        is_train=True, save=True)
    assert os.path.exists(tmp_path / "exp" / "opt.txt")
    assert os.path.exists(tmp_path / "exp" / "opt.pkl")
    # load_from_opt_file restores the saved config; explicit CLI flags win
    opt2 = parse_options(["--checkpoints_dir", str(tmp_path), "--name", "exp",
                          "--load_from_opt_file", "--batchSize", "4"],
                         is_train=False, save=False)
    assert opt2.ngf == 24 and opt2.w_dim == 12   # from the pickle
    assert opt2.batchSize == 4                   # CLI override
    assert opt2.isTrain is False


def test_replace_finalizes():
    opt = Options(label_nc=6).finalize()
    assert opt.semantic_nc == 6
    opt2 = opt.replace(label_nc=2)
    assert opt2.semantic_nc == 2


def test_true_default_bools_get_inverted_enable_flags():
    """A True-default bool 'no_X' exposes '--X' to enable the feature
    (store_false on no_X) — e.g. --vgg_loss turns the VGG loss on."""
    opt = parse_options(["--vgg_loss", "--vgg_weights", "w.ckpt"],
                        is_train=True, save=False)
    assert opt.no_vgg_loss is False and opt.vgg_weights == "w.ckpt"
    # False-default bools get only the plain store_true flag
    opt = parse_options(["--no_ganFeat_loss"], is_train=True, save=False)
    assert opt.no_ganFeat_loss is True
