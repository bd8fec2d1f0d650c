"""Additional training-path coverage: D_steps_per_G schedule, eval with
running stats, process-sharded loading, device prefetch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seg2eye_tpu.data.loader import DataLoader, device_prefetch
from seg2eye_tpu.models.pix2pix import Pix2Pix
from seg2eye_tpu.options import Options
from seg2eye_tpu.train import state as state_lib
from seg2eye_tpu.train.steps import StepFunctions


def tiny_opt(**kw):
    base = dict(ngf=4, ndf=4, crop_size=32, aspect_ratio=1.0, w_dim=8,
                input_ns=2, batchSize=2, compute_dtype="float32",
                isTrain=True)
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


def test_d_steps_per_g_schedule():
    """D_steps_per_G=2: G updates on even iterations only, D every iteration
    (reference train.py:56-62)."""
    opt = tiny_opt(D_steps_per_G=2)
    model = Pix2Pix(opt)
    state = state_lib.create_state(model, jax.random.PRNGKey(0))
    steps = StepFunctions(model, donate=False)
    batch = tiny_batch()
    g0 = jax.tree_util.tree_leaves(state.variables["G"]["params"])[0]
    # i=1 (odd): D only
    state1, d_losses = steps.d_step(state, batch)
    g1 = jax.tree_util.tree_leaves(state1.variables["G"]["params"])[0]
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))
    d0 = jax.tree_util.tree_leaves(state.variables["D"]["params"])[0]
    d1 = jax.tree_util.tree_leaves(state1.variables["D"]["params"])[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))


def test_eval_running_stats_path():
    """eval_use_running_stats=True inference uses BN running stats (proper
    eval mode, opt-in; reference effectively never does)."""
    opt = tiny_opt(eval_use_running_stats=True)
    model = Pix2Pix(opt)
    variables = model.init_variables(jax.random.PRNGKey(0), with_disc=False)
    batch = {k: v for k, v in tiny_batch().items() if k != "target"}
    out = jax.jit(lambda v, b: model.inference(v, b))(variables, batch)
    assert np.isfinite(np.asarray(out)).all()


def test_reuse_fake_step():
    """--reuse_fake trains D on the G-step's fake (opt-in, ~35% faster);
    both optimizers still update and losses stay finite."""
    opt = tiny_opt(reuse_fake=True)
    model = Pix2Pix(opt)
    state = state_lib.create_state(model, jax.random.PRNGKey(0))
    steps = StepFunctions(model, donate=False)
    new_state, losses, _ = steps.train_step(state, tiny_batch())
    for net in ("G", "E", "D"):
        a = jax.tree_util.tree_leaves(state.variables[net]["params"])[0]
        b = jax.tree_util.tree_leaves(new_state.variables[net]["params"])[0]
        assert not np.allclose(np.asarray(a), np.asarray(b)), net
    assert all(np.isfinite(float(jnp.mean(v))) for v in losses.values())


class _IdxDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i, rng=None):
        return {"idx": np.array([i])}


def test_process_sharded_loader():
    """Global batch 4 over 2 processes -> each loads its half."""
    batches = {}
    for pi in range(2):
        dl = DataLoader(_IdxDataset(8), batch_size=4, shuffle=False,
                        drop_last=True, prefetch=0,
                        process_index=pi, process_count=2)
        batches[pi] = [b["idx"][:, 0].tolist() for b in dl]
    assert batches[0][0] == [0, 1] and batches[1][0] == [2, 3]
    assert batches[0][1] == [4, 5] and batches[1][1] == [6, 7]


def test_process_sharded_loader_rejects_uneven_tail():
    """A tail batch not divisible by process_count would hand processes
    unequal local shards (unassemblable by
    make_array_from_process_local_data) — the loader must hard-error
    (loader.py _load)."""
    dl = DataLoader(_IdxDataset(7), batch_size=4, shuffle=False,
                    drop_last=False, prefetch=0,
                    process_index=0, process_count=2)
    it = iter(dl)
    assert next(it)["idx"][:, 0].tolist() == [0, 1]
    with pytest.raises(ValueError, match="divisible"):
        next(it)  # tail of 3 over 2 processes


def test_device_prefetch_order():
    dl = DataLoader(_IdxDataset(6), batch_size=2, shuffle=False,
                    drop_last=True, prefetch=0)
    seen = [b["idx"][:, 0].tolist()
            for b in device_prefetch(dl, lambda b: b, depth=2)]
    assert seen == [[0, 1], [2, 3], [4, 5]]


def test_device_prefetch_abandonment():
    """Breaking out of a device_prefetch consumer mid-iteration must not
    deadlock and must release the worker thread (loader.py device_prefetch
    abandonment path)."""
    import threading
    import time

    before = threading.active_count()
    gen = device_prefetch(iter(range(50)), lambda x: x, depth=2)
    seen = []
    for x in gen:
        seen.append(x)
        if len(seen) == 4:
            break
    gen.close()
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert seen == [0, 1, 2, 3]
    assert threading.active_count() <= before


class _RngDataset:
    """Consumes per-sample rng draws (like augmentation would)."""
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i, rng=None):
        return {"idx": np.array([i]),
                "draw": np.array([int(rng.integers(0, 10 ** 9))])}


def test_loader_per_sample_rng_process_invariant():
    """Multi-process DP must load exactly what a single process loads for
    the same global batch: the epoch shuffle must stay synchronized across
    processes even though each process consumes augmentation draws only for
    its own shard (regression: one shared rng stream drove both, so
    epoch-2 permutations silently diverged between processes), and the
    per-sample draws themselves must match (seeded by (seed, epoch, global
    index), not by stream position)."""
    from seg2eye_tpu.data.loader import DataLoader

    single = DataLoader(_RngDataset(8), batch_size=4, shuffle=True,
                        drop_last=True, seed=3, prefetch=0)
    shards = [DataLoader(_RngDataset(8), batch_size=4, shuffle=True,
                         drop_last=True, seed=3, prefetch=0,
                         process_index=p, process_count=2)
              for p in (0, 1)]
    for epoch in range(3):                    # divergence showed at epoch 2
        ref = list(single)
        parts = [list(s) for s in shards]
        for b, full in enumerate(ref):
            got_idx = np.concatenate([parts[0][b]["idx"],
                                      parts[1][b]["idx"]])
            got_draw = np.concatenate([parts[0][b]["draw"],
                                       parts[1][b]["draw"]])
            np.testing.assert_array_equal(got_idx.ravel(),
                                          full["idx"].ravel())
            np.testing.assert_array_equal(got_draw.ravel(),
                                          full["draw"].ravel())


def test_loader_iter_abandonment_releases_worker():
    """Breaking out of a prefetching iteration must release the worker
    thread (regression: the worker's unbounded q.put blocked forever on a
    full queue once the consumer left, leaking the thread + a batch)."""
    import threading
    import time

    dl = DataLoader(_IdxDataset(64), batch_size=2, shuffle=False,
                    drop_last=True, prefetch=1)
    base = threading.active_count()
    it = iter(dl)
    next(it)
    it.close()                                # GeneratorExit -> finally
    deadline = time.time() + 5
    while threading.active_count() > base and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= base
