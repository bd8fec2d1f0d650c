"""End-to-end CLI-level tests: train loop, checkpoint layout, eval harness
(SURVEY §4e — file layouts checkpoints/<name>/{opt.txt,opt.pkl,iter.txt,
loss_log.txt,*_net_*.ckpt} and results/.../*.npy + pred_npy_list.txt)."""
import os

import numpy as np
import pytest

from seg2eye_tpu.data import schema
from seg2eye_tpu.eval.tester import Tester
from seg2eye_tpu.models.pix2pix import Pix2Pix
from seg2eye_tpu.options import Options
from seg2eye_tpu.train import state as state_lib
from seg2eye_tpu.train.loop import train
from seg2eye_tpu.utils import checkpoint


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    data = schema.write_synthetic_h5(str(d / "data.h5"), h=64, w=40)
    opt = Options(
        dataroot=data, name="exp", checkpoints_dir=str(d / "ckpt"),
        ngf=4, ndf=4, crop_size=32, aspect_ratio=1.0, w_dim=8, input_ns=2,
        batchSize=2, compute_dtype="float32", isTrain=True, seed=0,
        print_freq=2, save_latest_freq=10**9, display_freq=10**9,
        full_val_freq=10**9, niter=1, niter_decay=0,
    ).finalize()
    return d, opt


def test_train_loop_end_to_end(env):
    d, opt = env
    os.chdir(str(d))          # copy_src snapshots cwd
    opt.save()
    result = train(opt, max_steps=3)
    assert result["steps"] == 3
    assert all(np.isfinite(v) for v in result["losses"].values())
    # reference checkpoint-dir layout
    for fn in ("opt.txt", "opt.pkl", "iter.txt", "loss_log.txt", "src.zip",
               "latest_net_G.ckpt", "latest_net_D.ckpt", "latest_net_E.ckpt",
               "latest_optim.ckpt"):
        assert os.path.exists(os.path.join(opt.expr_dir, fn)), fn


def test_d_only_iterations_keep_g_losses(env):
    """With D_steps_per_G > 1, D-only iterations must keep reporting the
    LATEST generator losses (reference get_latest_losses merges stored
    g_losses into every d_losses dict, pix2pix_trainer.py:47-53) —
    regression: losses reset to {} so printed/returned dicts lost all G
    terms on odd iterations."""
    d, base = env
    os.chdir(str(d))
    opt = base.replace(name="exp_dsteps", D_steps_per_G=2).finalize()
    opt.save()
    seen = []
    train(opt, max_steps=2,
          step_hook=lambda s, losses: seen.append(sorted(losses.keys())))
    assert len(seen) == 2
    assert any(k.startswith("GAN") for k in seen[1]), seen[1]   # D-only iter
    assert any(k.startswith("D/") for k in seen[1])


def test_sigterm_preemption_saves_latest(env):
    """Cloud-TPU preemption (SIGTERM) must reach the crash-safe finally-save
    — the OS default action kills the process without running finally blocks
    (train/loop.py installs a main-thread handler routing it into the
    KeyboardInterrupt/SystemExit path, reference train.py:111-116)."""
    import signal

    d, base = env
    os.chdir(str(d))
    opt = base.replace(name="exp_sigterm").finalize()
    opt.save()
    before = signal.getsignal(signal.SIGTERM)

    def hook(step, losses):
        if step == 2:
            os.kill(os.getpid(), signal.SIGTERM)

    result = train(opt, max_steps=5, step_hook=hook)
    assert result["steps"] == 2            # preempted before step 3
    for fn in ("latest_net_G.ckpt", "latest_net_D.ckpt", "latest_net_E.ckpt",
               "latest_optim.ckpt", "iter.txt"):
        assert os.path.exists(os.path.join(opt.expr_dir, fn)), fn
    # the previous handler is restored on exit
    assert signal.getsignal(signal.SIGTERM) == before


def test_resume_from_checkpoint(env):
    d, opt = env
    # the earlier run already covered all of niter=1's batches: a resume has
    # nothing left to train (the reference would REPLAY the epoch — its
    # enumerate(start=epoch_iter) only renumbers; we skip trained batches)
    result = train(opt.replace(continue_train=True), max_steps=1)
    assert result["steps"] == 0
    # extending the schedule trains the next epoch
    result = train(opt.replace(continue_train=True, niter=2), max_steps=1)
    assert result["steps"] == 1


def test_resume_trajectory_bitwise(env):
    """Round-4 verdict item 5: N steps straight vs N' + save/restore + rest
    must give BITWISE-equal weights, optimizer moments, and step count.

    The framework is deterministic end-to-end: explicit PRNG everywhere, the
    epoch shuffle/augmentation streams are stateless in (seed, epoch), the
    checkpoint carries net variables + Adam moments + step, iter.txt carries
    the position, and a mid-epoch resume skips the already-trained batches
    (loop.py resume_skip — the reference replays the epoch, train.py:49).
    Shuffle and flips stay ON: determinism must not depend on serial mode."""
    import jax

    d, base = env
    os.chdir(str(d))

    def run(name, phases):
        opt = base.replace(name=name, niter=2, save_epoch_freq=1).finalize()
        opt.save()
        result = None
        for i, max_steps in enumerate(phases):
            o = opt.replace(continue_train=(i > 0))
            result = train(o, max_steps=max_steps)
        return result

    straight = run("exp_straight", [None])
    n = straight["steps"]
    assert n >= 4, f"need >=2 epochs of >=2 batches, got {n} steps"
    split = run("exp_split", [3, None])          # 3 = mid-epoch cut
    assert split["steps"] == n - 3

    sa, sb = straight["state"], split["state"]
    assert int(sa.step) == int(sb.step)
    for label, ta, tb in (("variables", sa.variables, sb.variables),
                          ("opt_g", sa.opt_g, sb.opt_g),
                          ("opt_d", sa.opt_d, sb.opt_d)):
        la = jax.tree_util.tree_leaves_with_path(jax.device_get(ta))
        lb = dict(jax.tree_util.tree_leaves_with_path(jax.device_get(tb)))
        assert len(la) == len(lb)
        for path, va in la:
            vb = lb[path]
            assert np.array_equal(np.asarray(va), np.asarray(vb)), (
                f"{label}{jax.tree_util.keystr(path)} differs after resume")


def test_tester_full_run_and_error_log(env):
    d, opt = env
    test_opt = opt.replace(isTrain=False, write_error_log=True)
    model = Pix2Pix(test_opt)
    state = state_lib.create_state(model, __import__("jax").random.PRNGKey(0))
    state = checkpoint.load_state(state, test_opt, "latest")
    tester = Tester(test_opt, dataset_key="validation")
    errors = tester.run(model, state.variables, mode="full",
                        write_error_log=True)
    key = "mse/validation/full/relative"
    assert key in errors and np.isfinite(errors[key])
    # error-log H5 with the reference schema
    import h5py
    log_path = os.path.join(tester.results_dir, "error_log_validation.h5")
    with h5py.File(log_path, "r") as log:
        assert set(log.keys()) == {"error", "user", "filename",
                                   "visualisation"}
        assert log["visualisation"].shape[1:] == (1, 380, 1000)
        assert log["error"][:tester.N].sum() > 0


def test_tester_rand_mode_error_log_offsets(env):
    """'rand' mode iterates SINGLE-SAMPLE batches: the error log must fill
    contiguously from offset 0 (regression: offsets were batch_index *
    batchSize, scattering entries at stride 4 and overrunning the dataset
    past N/batchSize iterations)."""
    d, opt = env
    test_opt = opt.replace(isTrain=False, write_error_log=True)
    model = Pix2Pix(test_opt)
    state = state_lib.create_state(model, __import__("jax").random.PRNGKey(0))
    state = checkpoint.load_state(state, test_opt, "latest")
    tester = Tester(test_opt, dataset_key="validation")
    n = min(tester.N, 3)                    # > batchSize iterations of bs=1
    tester.run(model, state.variables, mode="rand", limit=n,
               write_error_log=True)
    import h5py
    log_path = os.path.join(tester.results_dir, "error_log_validation.h5")
    with h5py.File(log_path, "r") as log:
        written = log["error"][:n]
        assert (written > 0).all()           # contiguous from offset 0
        assert log["error"][n:].sum() == 0   # nothing scattered past it


def test_tester_modes(env):
    d, opt = env
    test_opt = opt.replace(isTrain=False)
    model = Pix2Pix(test_opt)
    state = state_lib.create_state(model, __import__("jax").random.PRNGKey(0))
    tester = Tester(test_opt, dataset_key="validation")
    tester.run(model, state.variables, mode="rand", limit=2)
    tester.run(model, state.variables, mode="fix", limit=2)
    with pytest.raises(ValueError):
        tester.run(model, state.variables, mode="bogus")


def test_npy_dump_manifest(env):
    d, opt = env
    test_opt = opt.replace(isTrain=False, serial_batches=True, no_flip=True)
    model = Pix2Pix(test_opt)
    state = state_lib.create_state(model, __import__("jax").random.PRNGKey(0))
    tester = Tester(test_opt, dataset_key="test")
    manifest = tester.run_test(model, state.variables, limit=2)
    assert os.path.exists(manifest)
    lines = [ln for ln in open(manifest).read().splitlines() if ln]
    assert len(lines) == 2
    arr = np.load(lines[0])
    assert arr.dtype == np.uint8
    assert arr.shape == (640, 400)       # OpenEDS native submission format

def test_tester_spatial_shard_matches(env):
    """--spatial_shard (context-parallel eval over the 8-device mesh)
    scores the same as the default single-device path."""
    d, opt = env
    test_opt = opt.replace(isTrain=False)
    model = Pix2Pix(test_opt)
    state = state_lib.create_state(model, __import__("jax").random.PRNGKey(0))
    base = Tester(test_opt, dataset_key="validation")
    errs0 = base.run(model, state.variables, mode="fix", limit=2)
    cp = Tester(test_opt.replace(spatial_shard=True),
                dataset_key="validation")
    assert cp.mesh is not None and cp.mesh.shape["data"] == 8
    errs1 = cp.run(model, state.variables, mode="fix", limit=2)
    for k in errs0:
        np.testing.assert_allclose(errs0[k], errs1[k], rtol=2e-3, atol=1e-6,
                                   err_msg=k)


def test_train_loop_nonprimary_host_writes_nothing(env, monkeypatch):
    """Host-0 convention in the Seg2Eye loop (train/loop.py): a non-primary
    process must not touch the shared run directory — no src.zip, no
    loss_log.txt header (the Visualizer writes it at CONSTRUCTION), no
    checkpoints, no iter.txt — while still training symmetrically."""
    import jax as _jax
    d, base = env
    os.chdir(str(d))
    monkeypatch.setattr(_jax, "process_index", lambda: 1)
    opt = base.replace(name="exp_nonprimary").finalize()
    result = train(opt, max_steps=2)
    assert result["steps"] == 2
    assert all(np.isfinite(v) for v in result["losses"].values())
    leaked = [fn for fn in ("src.zip", "loss_log.txt", "iter.txt",
                            "latest_net_G.ckpt", "latest_optim.ckpt")
              if os.path.exists(os.path.join(opt.expr_dir, fn))]
    assert not leaked, leaked
