"""Single-step / multi-step training tests on synthetic data (SURVEY §4c)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seg2eye_tpu.models.pix2pix import Pix2Pix
from seg2eye_tpu.options import Options
from seg2eye_tpu.train import state as state_lib
from seg2eye_tpu.train.steps import StepFunctions
from seg2eye_tpu.utils import checkpoint


def tiny_opt(tmp, **kw):
    base = dict(ngf=4, ndf=4, crop_size=32, aspect_ratio=1.0, w_dim=8,
                input_ns=2, batchSize=2, compute_dtype="float32",
                isTrain=True, name="exp", checkpoints_dir=str(tmp),
                lambda_l2=10.0)
    base.update(kw)
    return Options(**base).finalize()


def tiny_batch(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "label": jnp.asarray(rng.integers(0, 4, (2, 32, 32))),
        "style_image": jnp.asarray(
            rng.uniform(-1, 1, (2, 2, 32, 32, 1)).astype(np.float32)),
        "target": jnp.asarray(
            rng.uniform(-1, 1, (2, 32, 32, 1)).astype(np.float32)),
    }


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    opt = tiny_opt(tmp_path_factory.mktemp("ckpt"))
    model = Pix2Pix(opt)
    state = state_lib.create_state(model, jax.random.PRNGKey(0))
    steps = StepFunctions(model, donate=False)
    return opt, model, state, steps


def test_fused_train_step(setup):
    opt, model, state, steps = setup
    batch = tiny_batch()
    new_state, losses, fake = steps.train_step(state, batch)
    # losses finite, contain the expected terms
    for key in ("GAN", "GAN_Feat", "L2/weighted", "L2/raw", "D/Fake", "D/real"):
        assert key in losses, losses.keys()
        assert np.isfinite(float(jnp.mean(losses[key]))), key
    assert fake.shape == (2, 32, 32, 1)
    # G/E/D params all changed
    for net in ("G", "E", "D"):
        before = jax.tree_util.tree_leaves(state.variables[net]["params"])[0]
        after = jax.tree_util.tree_leaves(new_state.variables[net]["params"])[0]
        assert not np.allclose(np.asarray(before), np.asarray(after)), net
    # spectral u and BN stats advanced
    u0 = jax.tree_util.tree_leaves(state.variables["G"]["spectral"])[0]
    u1 = jax.tree_util.tree_leaves(new_state.variables["G"]["spectral"])[0]
    assert not np.allclose(np.asarray(u0), np.asarray(u1))
    bs0 = jax.tree_util.tree_leaves(state.variables["G"]["batch_stats"])
    bs1 = jax.tree_util.tree_leaves(new_state.variables["G"]["batch_stats"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(bs0, bs1))
    assert int(new_state.step) == 1


def test_l2_loss_decreases(tmp_path):
    """Reconstruction-dominated config, G steps only (frozen D): the raw L2
    must trend down on a fixed batch."""
    opt = tiny_opt(tmp_path, lambda_l2=100.0, no_ganFeat_loss=True)
    model = Pix2Pix(opt)
    state = state_lib.create_state(model, jax.random.PRNGKey(0))
    steps = StepFunctions(model, donate=False)
    state.opt_g.hyperparams["learning_rate"] = jnp.asarray(2e-3, jnp.float32)
    batch = tiny_batch(1)
    history = []
    for i in range(10):
        state, losses, _ = steps.g_step(state, batch)
        history.append(float(jnp.mean(losses["L2/raw"])))
    assert all(np.isfinite(h) for h in history)
    assert min(history[5:]) < history[0], history


def test_grads_finite_separate_steps(setup):
    opt, model, state, steps = setup
    batch = tiny_batch(2)
    state, g_losses, _ = steps.g_step(state, batch)
    state, d_losses = steps.d_step(state, batch)
    for d in (g_losses, d_losses):
        for k, v in d.items():
            assert np.isfinite(float(jnp.mean(v))), k


def test_checkpoint_roundtrip(setup):
    opt, model, state, steps = setup
    state1, _, _ = steps.train_step(state, tiny_batch(3))
    checkpoint.save_state(state1, opt, "latest")
    assert checkpoint.has_checkpoint(opt, "latest")
    restored = checkpoint.load_state(state, opt, "latest")
    a = jax.tree_util.tree_leaves(state1.variables["G"]["params"])
    b = jax.tree_util.tree_leaves(restored.variables["G"]["params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # optimizer state (improvement over reference) restored too
    assert int(restored.step) == int(state1.step)


def test_lr_schedule():
    opt = Options(niter=14, niter_decay=7, lr=0.0002).finalize()
    assert state_lib.epoch_lr(opt, 1) == pytest.approx(0.0002)
    assert state_lib.epoch_lr(opt, 14) == pytest.approx(0.0002)
    # epoch 15 still trains at full lr (decrement happens at its end)
    assert state_lib.epoch_lr(opt, 15) == pytest.approx(0.0002)
    assert state_lib.epoch_lr(opt, 16) == pytest.approx(0.0002 * 6 / 7)
    assert state_lib.epoch_lr(opt, 21) == pytest.approx(0.0002 * 1 / 7)


def test_ttur():
    opt = Options().finalize()
    g, d = state_lib.ttur_lrs(opt, opt.lr)
    assert (g, d) == (0.0001, 0.0004)
    assert state_lib.ttur_betas(opt) == (0.0, 0.9)
    opt2 = Options(no_TTUR=True).finalize()
    assert state_lib.ttur_lrs(opt2, opt2.lr) == (0.0002, 0.0002)
    assert state_lib.ttur_betas(opt2) == (0.5, 0.999)
