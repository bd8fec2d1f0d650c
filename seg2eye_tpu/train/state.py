"""Train state: one pytree holding all networks + TTUR optimizers.

Parity notes (reference: models/pix2pix_model.py:92-110 create_optimizers,
trainers/pix2pix_trainer.py:68-88 update_learning_rate):
  * TTUR (default): Adam betas (0, 0.9), G lr = lr/2, D lr = lr*2.
  * no_TTUR: betas (beta1, beta2), both lr.
  * Linear LR decay to zero over niter_decay epochs once epoch > niter, with
    the same halving/doubling applied to the decayed base lr.
  * Optimizer G covers netG + netE params jointly (pix2pix_model.py:93-94).

TPU-first: the whole state is a single pytree so one jitted step updates
everything with donated buffers; LR is an injected hyperparameter mutated per
epoch on the host (exactly the reference's per-epoch schedule).
"""
from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax

from seg2eye_tpu.models.pix2pix import Pix2Pix
from seg2eye_tpu.options import Options


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    variables: Dict[str, Any]         # {'G','E','D'} flax variable dicts
    opt_g: Any = None                 # optax state over {'G','E'} params
    opt_d: Any = None

    def params_ge(self):
        return {"G": self.variables["G"]["params"],
                "E": self.variables["E"]["params"]}

    def params_d(self):
        return self.variables["D"]["params"]


def ge_live_mask(params) -> dict:
    """torch.optim.Adam SKIPS parameters whose ``.grad`` is None — and in
    the reference trainer exactly one G-optimizer param group never receives
    gradients: netE's ``fc_var`` (logvar feeds only the dead
    encode_z/KLD path, pix2pix_model.py:266-269).  torch therefore never
    touches it — no Adam step, no weight decay.  jax gradients there are
    zeros rather than None, which is equivalent at weight_decay=0 but under
    coupled wd becomes a real ±lr·sign(p) beta1=0 Adam move every step.
    Measured: the round-5 lockstep ours-float64 arm localized the E.params
    drift (2.4e-2 step-1 rel rms, precision-independent, surviving the
    style-lambda ablation) to exactly this — evidence/lockstep.json.
    Masking fc_var out of the G optimizer reproduces torch bit-for-bit."""
    def live(path, _leaf):
        return not any(getattr(k, "key", None) == "fc_var" for k in path)
    return jax.tree_util.tree_map_with_path(live, params)


def make_optimizer(lr: float, beta1: float, beta2: float,
                   weight_decay: float = 0.0,
                   live_mask=None) -> optax.GradientTransformation:
    def build(learning_rate):
        if weight_decay:
            # torch.optim.Adam(weight_decay=) adds wd*param to the gradient
            # BEFORE the Adam moments (coupled L2), unlike decoupled adamw
            tx = optax.chain(
                optax.add_decayed_weights(weight_decay),
                optax.scale_by_adam(b1=beta1, b2=beta2),
                optax.scale_by_learning_rate(learning_rate))
        else:
            tx = optax.adam(learning_rate, b1=beta1, b2=beta2)
        if live_mask is not None:
            # dead (masked-out) leaves pass their raw gradient — exactly 0
            # for a dead param — through as the update: frozen, like torch
            tx = optax.masked(tx, live_mask)
        return tx
    return optax.inject_hyperparams(build)(learning_rate=lr)


def ttur_lrs(opt: Options, base_lr: float):
    if opt.no_TTUR:
        return base_lr, base_lr
    return base_lr / 2.0, base_lr * 2.0


def ttur_betas(opt: Options):
    if opt.no_TTUR:
        return opt.beta1, opt.beta2
    return 0.0, 0.9


def create_state(model: Pix2Pix, rng: jax.Array) -> TrainState:
    opt = model.opt
    variables = model.init_variables(rng, with_disc=opt.isTrain)
    if not opt.isTrain:
        return TrainState(step=jnp.zeros((), jnp.int32), variables=variables)
    b1, b2 = ttur_betas(opt)
    g_lr, d_lr = ttur_lrs(opt, opt.lr)
    tx_g = make_optimizer(g_lr, b1, b2, opt.weight_decay,
                          live_mask=ge_live_mask)
    tx_d = make_optimizer(d_lr, b1, b2, opt.weight_decay)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        variables=variables,
        opt_g=tx_g.init({"G": variables["G"]["params"],
                         "E": variables["E"]["params"]}),
        opt_d=tx_d.init(variables["D"]["params"]),
    )
    return state


def epoch_lr(opt: Options, epoch: int) -> float:
    """Base LR for a given (1-indexed) epoch, matching the reference's
    running-decrement schedule (pix2pix_trainer.py:68-88): constant for
    epochs <= niter, then minus lr/niter_decay per epoch."""
    # reference decrements at the END of each epoch e>niter, so epoch niter+1
    # still trains at full lr and epoch e trains at lr - (e-niter-1)*lr/decay
    steps = max(0, epoch - opt.niter - 1)
    if steps == 0 or opt.niter_decay == 0:
        return opt.lr
    return opt.lr - steps * (opt.lr / opt.niter_decay)


def set_learning_rate(state: TrainState, opt: Options, epoch: int) -> TrainState:
    """Host-side per-epoch LR update (inject_hyperparams makes LR a leaf)."""
    base = epoch_lr(opt, epoch)
    g_lr, d_lr = ttur_lrs(opt, base)
    opt_g = state.opt_g
    opt_d = state.opt_d
    opt_g.hyperparams["learning_rate"] = jnp.asarray(g_lr, jnp.float32)
    opt_d.hyperparams["learning_rate"] = jnp.asarray(d_lr, jnp.float32)
    return state.replace(opt_g=opt_g, opt_d=opt_d)
