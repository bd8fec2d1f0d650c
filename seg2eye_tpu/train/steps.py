"""Jitted training steps.

The reference runs two separate torch forward/backward passes per iteration
(train.py:52-62): a generator step (G+E update, D frozen) and a discriminator
step (D update, fake regenerated under no_grad).  Here each step is one jitted
XLA program; for the default D_steps_per_G == 1 the two are fused into a
single program (``train_step``) — one dispatch, one donation, and the fake
image from the G step is reused for the D step exactly as torch's
detached-fake semantics allow (pix2pix_model.py:251-254 regenerates it only
because the G weights were already updated; we reproduce that by regenerating
with the *updated* G params inside the fused step).
"""
from __future__ import annotations

from typing import Dict

import jax

from seg2eye_tpu.models.pix2pix import Pix2Pix
from seg2eye_tpu.train.state import (TrainState, ge_live_mask, make_optimizer,
                                     ttur_betas, ttur_lrs)
from seg2eye_tpu.utils.platform import training_compiler_options, training_jit


def _extra_nets(state: TrainState) -> Dict:
    """Collections beyond G/E/D (e.g. the frozen 'VGG' perceptual net):
    carried through every step untouched, never optimized."""
    return {k: v for k, v in state.variables.items()
            if k not in ("G", "E", "D")}


def _g_update(model: Pix2Pix, tx_g, state: TrainState, batch: Dict):
    extra = _extra_nets(state)

    def loss_fn(params_ge):
        variables = {
            "G": {**state.variables["G"], "params": params_ge["G"]},
            "E": {**state.variables["E"], "params": params_ge["E"]},
            "D": state.variables["D"], **extra,
        }
        total, (losses, fake, newv) = model.generator_loss(variables, batch)
        return total, (losses, fake, newv)

    params = state.params_ge()
    (g_loss, (losses, fake, newv)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    updates, new_opt_g = tx_g.update(grads, state.opt_g, params)
    new_params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    variables = {
        "G": {**newv["G"], "params": new_params["G"]},
        "E": {**newv["E"], "params": new_params["E"]},
        "D": newv["D"], **extra,
    }
    state = state.replace(variables=variables, opt_g=new_opt_g)
    return state, losses, fake


def _d_update(model: Pix2Pix, tx_d, state: TrainState, batch: Dict,
              fake=None):
    if fake is None:
        # regenerate fake with current (post-G-update) params under
        # stop-grad, updating G/E mutable stats as torch's train-mode
        # no_grad forward does
        seg, style, target = model.preprocess(batch)
        fake, _, _, gen_new = model.generate_fake(state.variables, seg,
                                                  style, train=True)
    else:
        gen_new = {"G": state.variables["G"], "E": state.variables["E"]}
    fake = jax.lax.stop_gradient(fake)

    def loss_fn(params_d):
        variables = {
            "G": state.variables["G"], "E": state.variables["E"],
            "D": {**state.variables["D"], "params": params_d},
        }
        total, (losses, newv) = model.discriminator_loss(variables, batch,
                                                         fake=fake)
        return total, (losses, newv["D"])

    params = state.params_d()
    (d_loss, (losses, new_d)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    updates, new_opt_d = tx_d.update(grads, state.opt_d, params)
    new_params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    variables = {
        "G": gen_new["G"], "E": gen_new["E"],
        "D": {**new_d, "params": new_params}, **_extra_nets(state),
    }
    state = state.replace(variables=variables, opt_d=new_opt_d)
    return state, losses


class StepFunctions:
    """Compiled step functions for a model; build once, reuse across epochs."""

    def __init__(self, model: Pix2Pix, donate: bool = True):
        self.model = model
        opt = model.opt
        b1, b2 = ttur_betas(opt)
        g_lr, d_lr = ttur_lrs(opt, opt.lr)
        self.tx_g = make_optimizer(g_lr, b1, b2, opt.weight_decay,
                                   live_mask=ge_live_mask)
        self.tx_d = make_optimizer(d_lr, b1, b2, opt.weight_decay)
        dn = (0,) if donate else ()
        # training_jit: backward passes contain backprop-filter convs, which
        # hit the small-batch space-to-batch compile crash (utils/platform.py)
        self.compiler_options = training_compiler_options()
        self.g_step = training_jit(self._g_step, donate_argnums=dn)
        self.d_step = training_jit(self._d_step, donate_argnums=dn)
        self.train_step = training_jit(self._train_step, donate_argnums=dn)

    def _g_step(self, state: TrainState, batch: Dict):
        state, losses, fake = _g_update(self.model, self.tx_g, state, batch)
        return state.replace(step=state.step + 1), losses, fake

    def _d_step(self, state: TrainState, batch: Dict):
        state, losses = _d_update(self.model, self.tx_d, state, batch)
        return state, losses

    def _train_step(self, state: TrainState, batch: Dict):
        """Fused G-then-D step (reference iteration order, train.py:52-62).
        With opt.reuse_fake the D update trains on the G-step's fake instead
        of regenerating with the updated G (opt-in deviation, ~35% faster)."""
        state, g_losses, fake = _g_update(self.model, self.tx_g, state, batch)
        reuse = fake if self.model.opt.reuse_fake else None
        state, d_losses = _d_update(self.model, self.tx_d, state, batch,
                                    fake=reuse)
        return (state.replace(step=state.step + 1),
                {**g_losses, **d_losses}, fake)
