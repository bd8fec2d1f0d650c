"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY §4d):
data-parallel sharding must not change the math."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seg2eye_tpu.models.pix2pix import Pix2Pix
from seg2eye_tpu.options import Options
from seg2eye_tpu.parallel.sharding import (batch_sharding, make_mesh,
                                           param_shardings, replicate_state,
                                           shard_batch)
from seg2eye_tpu.train import state as state_lib
from seg2eye_tpu.train.steps import StepFunctions


def tiny_opt(**kw):
    base = dict(ngf=4, ndf=4, crop_size=32, aspect_ratio=1.0, w_dim=8,
                input_ns=2, batchSize=4, compute_dtype="float32",
                isTrain=True)
    base.update(kw)
    return Options(**base).finalize()


def tiny_batch(bs=4, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "label": rng.integers(0, 4, (bs, 32, 32)),
        "style_image": rng.uniform(-1, 1, (bs, 2, 32, 32, 1)).astype(np.float32),
        "target": rng.uniform(-1, 1, (bs, 32, 32, 1)).astype(np.float32),
    }


def test_mesh_shapes():
    mesh = make_mesh(tiny_opt(), data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    # batch non-divisibility is a hard error (reference
    # base_options.py:170-172) unless explicitly allowed
    with pytest.raises(ValueError, match="not divisible"):
        make_mesh(tiny_opt(batchSize=3), data=8, model=1)
    mesh2 = make_mesh(tiny_opt(batchSize=3), data=8, model=1,
                      allow_uneven=True)
    assert mesh2.shape["data"] in (1, 3)


def test_shard_batch_layout():
    mesh = make_mesh(None, data=4, model=2)
    db = shard_batch(tiny_batch(), mesh)
    shard_shapes = [s.data.shape for s in db["label"].addressable_shards]
    assert all(s == (1, 32, 32) for s in shard_shapes)


def test_dp_matches_single_device():
    """One fused G+D step on a 4-way data mesh == unsharded step."""
    opt = tiny_opt()
    model = Pix2Pix(opt)
    batch = tiny_batch()
    steps = StepFunctions(model, donate=False)

    state0 = state_lib.create_state(model, jax.random.PRNGKey(0))
    _, losses_ref, fake_ref = steps.train_step(
        state0, {k: jnp.asarray(v) for k, v in batch.items()})

    mesh = make_mesh(opt, data=4, model=1)
    state_sh = replicate_state(state0, mesh)
    db = shard_batch(batch, mesh)
    _, losses_sh, fake_sh = steps.train_step(state_sh, db)

    for k in losses_ref:
        np.testing.assert_allclose(
            np.mean(np.asarray(losses_ref[k])),
            np.mean(np.asarray(losses_sh[k])), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fake_ref), np.asarray(fake_sh),
                               rtol=2e-3, atol=2e-4)


def test_train_loop_applies_param_shardings(tmp_path):
    """The REAL train loop places the state on the mesh: with model_axis=2
    and a low tp_min_channels, conv kernels come out TP-sharded over 'model'
    after training steps (VERDICT r1: TP must not live only in the dryrun)."""
    import os

    from seg2eye_tpu.data import schema
    from seg2eye_tpu.train.loop import train

    data = schema.write_synthetic_h5(str(tmp_path / "data.h5"), h=32, w=32)
    opt = Options(
        dataroot=data, name="exp", checkpoints_dir=str(tmp_path / "ckpt"),
        ngf=4, ndf=4, crop_size=32, aspect_ratio=1.0, w_dim=8, input_ns=2,
        batchSize=4, compute_dtype="float32", isTrain=True, seed=0,
        data_axis=2, model_axis=2, tp_min_channels=16,
        print_freq=10**9, save_latest_freq=10**9, display_freq=10**9,
        full_val_freq=10**9, niter=5, niter_decay=0,
    ).finalize()
    cwd = os.getcwd()
    os.chdir(str(tmp_path))                     # copy_src snapshots cwd
    try:
        result = train(opt, max_steps=2)
    finally:
        os.chdir(cwd)
    assert result["steps"] == 2
    assert all(np.isfinite(v) for v in result["losses"].values())
    state = result["state"]
    leaves = [x for _, x in jax.tree_util.tree_leaves_with_path(
        state.variables["G"]["params"]) if hasattr(x, "addressable_shards")]
    tp_sharded = [x for x in leaves
                  if x.addressable_shards[0].data.shape != x.shape]
    assert tp_sharded, "no conv kernel ended up TP-sharded over 'model'"


def test_tp_param_sharding_executes():
    """Conv kernels sharded over 'model' still produce the same forward."""
    opt = tiny_opt(model_axis=2)
    model = Pix2Pix(opt)
    mesh = make_mesh(opt, data=2, model=2)
    variables = model.init_variables(jax.random.PRNGKey(0), with_disc=False)
    batch = tiny_batch(2)
    fn = jax.jit(lambda v, l, s: model.inference(
        v, {"label": l, "style_image": s}))
    out_ref = fn(variables, jnp.asarray(batch["label"]),
                 jnp.asarray(batch["style_image"]))

    shardings = param_shardings(variables, mesh, min_channels=16)
    v_sh = jax.device_put(variables, shardings)
    # at least one kernel is actually sharded over 'model'
    flat = jax.tree_util.tree_leaves_with_path(v_sh)
    assert any(len(x.addressable_shards) > 1 and
               x.addressable_shards[0].data.shape != x.shape
               for _, x in flat if hasattr(x, "addressable_shards"))
    db = shard_batch({k: batch[k] for k in ("label", "style_image")}, mesh)
    out_sh = fn(v_sh, db["label"], db["style_image"])
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_sh),
                               rtol=2e-3, atol=2e-4)


def test_dp_uint8_transport_matches_f32():
    """The uint8 device-transport batch shards identically over the data
    axis and the in-graph normalize yields the same losses as the f32
    batch."""
    opt = tiny_opt()
    model = Pix2Pix(opt)
    steps = StepFunctions(model, donate=False)
    f32 = tiny_batch()
    u8 = {
        "label": f32["label"].astype(np.uint8),
        "style_image": np.round(
            (f32["style_image"] * 0.5 + 0.5) * 255.0).astype(np.uint8),
        "target": np.round(
            (f32["target"] * 0.5 + 0.5) * 255.0).astype(np.uint8),
    }
    # the f32 twin of the quantized uint8 batch (identical host formula)
    f32q = {
        "label": f32["label"],
        "style_image": (u8["style_image"].astype(np.float32) / 255.0 - 0.5)
        / 0.5,
        "target": (u8["target"].astype(np.float32) / 255.0 - 0.5) / 0.5,
    }
    mesh = make_mesh(opt, data=4, model=1)
    state0 = state_lib.create_state(model, jax.random.PRNGKey(0))
    state_sh = replicate_state(state0, mesh)
    _, losses_u8, fake_u8 = steps.train_step(state_sh, shard_batch(u8, mesh))
    state_sh2 = replicate_state(state0, mesh)
    _, losses_f32, fake_f32 = steps.train_step(state_sh2,
                                               shard_batch(f32q, mesh))
    for k in losses_f32:
        np.testing.assert_allclose(
            np.mean(np.asarray(losses_u8[k])),
            np.mean(np.asarray(losses_f32[k])), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fake_u8), np.asarray(fake_f32),
                               rtol=2e-3, atol=2e-4)


def test_spatial_sharded_inference_matches():
    """CP analogue: H-axis sharding over 'data' for low-batch serving —
    same outputs as the replicated program.

    ``spatial_constraint`` is load-bearing, not an optimization: without it
    GSPMD keeps the generator's bottleneck activations (H=2 here) on padded
    uneven shards, where the partitioned 3x3 conv computes WRONG borders
    (measured 6e-3 = 100% of signal at this tiny config, vs 3.6e-7 pure
    reduction-order noise with the constraint)."""
    from seg2eye_tpu.parallel.sharding import (shard_batch_spatial,
                                               spatial_constraint)

    opt = tiny_opt(isTrain=False, batchSize=2)
    model = Pix2Pix(opt)
    variables = model.init_variables(jax.random.PRNGKey(0))
    batch = tiny_batch(bs=2)
    del batch["target"]

    ref = np.asarray(model.inference(
        variables, {k: jnp.asarray(v) for k, v in batch.items()}))

    mesh = make_mesh(None, data=4, model=1)
    db = shard_batch_spatial(batch, mesh)
    # H=32 divides data=4 -> really sharded on H
    assert tuple(db["label"].sharding.spec)[:2] == (None, "data")
    cs = spatial_constraint(mesh)
    infer = jax.jit(lambda v, b: model.inference(v, b, constrain=cs))
    out = np.asarray(infer(replicate_state(variables, mesh), db))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_default_data_mesh_fallbacks(monkeypatch):
    """Non-dividing batch: single-process falls back to mesh-free with a
    warning; multi-process hard-errors (process-sharded loaders make the
    mesh-free path silently train unsynchronized per-host models)."""
    from seg2eye_tpu.parallel import sharding as sh

    n = jax.device_count()
    assert sh.default_data_mesh(n * 2).shape["data"] == n

    warnings = []
    assert sh.default_data_mesh(n * 2 + 1, warn=warnings.append) is None
    assert warnings and "not divisible" in warnings[0]

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="multi-process"):
        sh.default_data_mesh(n * 2 + 1)
