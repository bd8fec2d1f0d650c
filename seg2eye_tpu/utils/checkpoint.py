"""Checkpointing: per-network files with 'latest' alias + optimizer state.

Parity notes (reference: util/util.py:195-221, trainers save paths):
  * Files are named ``{epoch}_net_{G,D,E}.ckpt`` in checkpoints_dir/name,
    with ``latest`` written continuously (train.py:85,102,113).
  * The reference does NOT save optimizer state (SURVEY §5.4); we do, in
    ``{epoch}_optim.ckpt`` — resume restores Adam moments too (improvement,
    flagged in docs).
  * Loading restores by pytree structure (flax.serialization), the analogue
    of state_dict restore with the DataParallel prefix repair made moot by
    functional parameters.
"""
from __future__ import annotations

import os
import flax.serialization
import jax

from seg2eye_tpu.train.state import TrainState


def _path(opt, epoch, name: str) -> str:
    return os.path.join(opt.expr_dir, f"{epoch}_{name}.ckpt")


def _atomic_write(path: str, data: bytes) -> None:
    # write-then-rename: a concurrent reader never sees a partial checkpoint.
    # pid-unique tmp name: two same-host writers (e.g. a misconfigured
    # multi-process run without the host-0 guard) must not truncate each
    # other's in-flight tmp file — last rename wins with an intact file
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def save_state(state: TrainState, opt, epoch) -> None:
    os.makedirs(opt.expr_dir, exist_ok=True)
    state = jax.device_get(state)
    for net in ("G", "D", "E"):
        if net in state.variables:
            _atomic_write(_path(opt, epoch, f"net_{net}"),
                          flax.serialization.to_bytes(state.variables[net]))
    aux = {"step": state.step, "opt_g": state.opt_g, "opt_d": state.opt_d}
    if state.opt_g is not None:
        _atomic_write(_path(opt, epoch, "optim"),
                      flax.serialization.to_bytes(aux))


def load_state(state: TrainState, opt, epoch,
               load_optim: bool = True, strict: bool = False) -> TrainState:
    """Restore networks (and optimizer state when present) into ``state``.
    With ``strict``, a missing network file is an error — evaluation must
    never silently run random weights."""
    variables = dict(state.variables)
    for net in list(variables.keys()):
        p = _path(opt, epoch, f"net_{net}")
        if strict and not os.path.exists(p):
            raise FileNotFoundError(
                f"No checkpoint for net{net} at {p} "
                f"(which_epoch='{epoch}')")
        if os.path.exists(p):
            with open(p, "rb") as f:
                try:
                    variables[net] = flax.serialization.from_bytes(
                        variables[net], f.read())
                except ValueError as e:
                    raise ValueError(
                        f"Checkpoint {p} does not match the current model "
                        f"structure (different config, or a checkpoint from "
                        f"an older framework version). Original error: {e}"
                    ) from e
    state = state.replace(variables=variables)
    p = _path(opt, epoch, "optim")
    if load_optim and state.opt_g is not None and os.path.exists(p):
        aux = {"step": state.step, "opt_g": state.opt_g, "opt_d": state.opt_d}
        with open(p, "rb") as f:
            aux = flax.serialization.from_bytes(aux, f.read())
        state = state.replace(step=aux["step"], opt_g=aux["opt_g"],
                              opt_d=aux["opt_d"])
    return state


def has_checkpoint(opt, epoch) -> bool:
    return os.path.exists(_path(opt, epoch, "net_G"))


def load_vgg(variables: dict, opt) -> dict:
    """Load converted VGG19 weights (--vgg_weights) into variables['VGG'].
    Training with --no_vgg_loss=False and no weights file is an error —
    a random perceptual net silently corrupts the loss."""
    if opt.no_vgg_loss:
        return variables
    if not opt.vgg_weights:
        raise ValueError(
            "--no_vgg_loss=False needs --vgg_weights (convert torchvision "
            "vgg19 with tools/convert_torch_checkpoint.py --vgg19_pth)")
    with open(opt.vgg_weights, "rb") as f:
        vgg = flax.serialization.from_bytes(variables["VGG"], f.read())
    return {**variables, "VGG": vgg}
