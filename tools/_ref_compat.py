"""Shared shims for importing the torch reference (/root/reference) in tools.

Three compatibility pieces the parity/twin/prepare oracles all need, held
once (review finding round 4: previously copy-pasted per tool):

* stub_torchvision() — the reference only needs torchvision transitively
  (data/base_dataset.py imports transforms it never runs in our use); no
  torchvision wheel is installed, so a module stub satisfies the imports.
* stub_util_tester() — models/pix2pix_model.py:6 does
  ``from util.tester import MSECalculator``; util/tester.py drags in
  h5py/visualizer/scipy.misc, but its MSECalculator IS
  models.networks.loss.MSECalculator re-exported — stub the module with
  the identical class object.  Must be called AFTER sys.path has the
  reference root (it imports models.networks.loss from there).
* float_betas_adam() — the reference's TTUR betas are the int/float pair
  (0, 0.9) (models/pix2pix_model.py:102); torch>=2.x rejects mixed-type
  betas, so wrap torch.optim.Adam with a float cast (numerically
  identical) around create_optimizers calls.
"""
import contextlib
import sys
import types


def stub_torchvision():
    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    tr.Compose = tr.Resize = tr.Lambda = tr.ToTensor = tr.Normalize = object
    tv.transforms = tr
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tr)


def add_reference_path(ref="/root/reference"):
    if ref not in sys.path:
        sys.path.insert(0, ref)


def stub_util_tester():
    if "util.tester" not in sys.modules:
        import models.networks.loss as ref_loss
        ut = types.ModuleType("util.tester")
        ut.MSECalculator = ref_loss.MSECalculator
        sys.modules["util.tester"] = ut


@contextlib.contextmanager
def float_betas_adam():
    import torch
    _adam = torch.optim.Adam

    def adam_f(params, *args, **kwargs):
        # full pass-through: the patch is process-wide for the duration of
        # the context, so any other Adam construction (positional args,
        # eps=, amsgrad=, ...) must still work — only betas is touched.
        # betas is Adam's second positional after params (lr, betas, ...)
        if "betas" in kwargs:
            kwargs["betas"] = tuple(float(b) for b in kwargs["betas"])
        elif len(args) >= 2:
            args = (args[0], tuple(float(b) for b in args[1]), *args[2:])
        return _adam(params, *args, **kwargs)

    torch.optim.Adam = adam_f
    try:
        yield
    finally:
        torch.optim.Adam = _adam
