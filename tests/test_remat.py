"""Generator-block rematerialization (`--remat`, Options.remat).

The remat path exists for the historical size-512 geometry (the published
checkpoints' shape, scripts/current_runs_spadestyle.sh:11,62) where
activation HBM limits the per-chip batch.  nn.remat recomputes each
SPADE+Style block in the backward pass instead of keeping its internals
resident — same ops in the same order, so a remat step must match a
non-remat step numerically and must not change the parameter tree.
"""
import jax
import jax.numpy as jnp
import numpy as np

from seg2eye_tpu.models.pix2pix import Pix2Pix
from seg2eye_tpu.options import Options
from seg2eye_tpu.train import state as state_lib
from seg2eye_tpu.train.steps import StepFunctions


def _opt(**kw):
    base = dict(ngf=4, ndf=4, crop_size=32, aspect_ratio=1.0, w_dim=8,
                input_ns=2, batchSize=2, compute_dtype="float32",
                isTrain=True)
    base.update(kw)
    return Options(**base).finalize()


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "label": jnp.asarray(rng.integers(0, 4, (2, 32, 32))),
        "style_image": jnp.asarray(
            rng.uniform(-1, 1, (2, 2, 32, 32, 1)).astype(np.float32)),
        "target": jnp.asarray(
            rng.uniform(-1, 1, (2, 32, 32, 1)).astype(np.float32)),
    }


def _one_step(remat: bool):
    opt = _opt(remat=remat)
    model = Pix2Pix(opt)
    state = state_lib.create_state(model, jax.random.PRNGKey(0))
    steps = StepFunctions(model, donate=False)
    state, losses, _ = steps.train_step(state, _batch())
    return state, {k: float(np.mean(np.asarray(v))) for k, v in losses.items()}


def test_remat_step_matches_non_remat():
    """Losses and tree structure match.  Post-Adam params are NOT compared
    element-wise: beta1=0 Adam moves a near-zero-gradient element by exactly
    +/-lr, so f32 fusion noise can flip isolated signs (the same chaos the
    lockstep oracle documents, PARITY.md) — gradient-level equality is the
    meaningful remat check (test below)."""
    s0, l0 = _one_step(False)
    s1, l1 = _one_step(True)
    assert set(l0) == set(l1)
    for k in l0:
        np.testing.assert_allclose(l0[k], l1[k], rtol=2e-5, atol=1e-6,
                                   err_msg=f"loss {k}")
    # identical tree structure (remat must not rename/move any variable)
    p0 = jax.tree_util.tree_structure(s0.variables)
    p1 = jax.tree_util.tree_structure(s1.variables)
    assert p0 == p1
    for a in jax.tree_util.tree_leaves(s1.variables):
        assert np.isfinite(np.asarray(a)).all()


def test_remat_generator_grads_match():
    """G-step gradients with remat on vs off agree to f32 fusion noise —
    the backward pass recomputes identical ops in identical order."""
    batch = _batch()
    grads = {}
    for remat in (False, True):
        model = Pix2Pix(_opt(remat=remat))
        v = model.init_variables(jax.random.PRNGKey(0))
        g = jax.jit(jax.grad(
            lambda vars_: model.generator_loss(vars_, batch)[0]))(v)
        grads[remat] = g
    for a, b in zip(jax.tree_util.tree_leaves(grads[False]),
                    jax.tree_util.tree_leaves(grads[True])):
        a, b = np.asarray(a), np.asarray(b)
        if not np.issubdtype(a.dtype, np.floating):
            continue
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5 * scale)


def test_remat_flag_plumbs_to_generator():
    opt = _opt(remat=True)
    assert Pix2Pix(opt).gen.remat is True
    assert Pix2Pix(_opt()).gen.remat is False
