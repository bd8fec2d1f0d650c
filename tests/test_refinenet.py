"""RefineNet system tests: DeepLab parity, dataset joins, training loop."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seg2eye_tpu.data import schema
from seg2eye_tpu.data.loader import DataLoader, subsample
from seg2eye_tpu.models.deeplab import DeepLab
from seg2eye_tpu.models.layers import param_count
from seg2eye_tpu.refinenet.config import RefineNetConfig
from seg2eye_tpu.refinenet.dataset import (RefineNetDataset, colorize_segmap,
                                           write_synthetic_refinenet_fixtures)
from seg2eye_tpu.refinenet.model import RefineNetModel, SegNetModel
from seg2eye_tpu.refinenet.segnet_dataset import SegNetDataset
from seg2eye_tpu.refinenet.training import (Trainer, do_visualizations,
                                            learning_rate_schedule, main_loop)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    d = tmp_path_factory.mktemp("refinenet")
    data = schema.write_synthetic_h5(str(d / "data.h5"), h=64, w=40)
    paths = write_synthetic_refinenet_fixtures(str(d), data)
    cfg = RefineNetConfig(
        dataroot=data, batch_size=2, test_batch_size=2, num_epochs=1,
        num_warmup_epochs=0, test_every_n_steps=10**6, log_every_n_steps=2,
        compute_dtype="float32", resnet_depth=14, input_width=40,
        input_height=64, output_dir_base=str(d / "outputs"), prefetch=0,
        **paths)
    return d, cfg


def test_deeplab_param_parity():
    """Param totals measured from the vendored torch code at num_classes=1:
    resnet101 59,339,169 (59,339,940 at nc=4), xception 54,700,177,
    drn-d-54 40,731,921, mobilenetv2 5,810,913. Identical kernel shapes."""
    for nc, expect in ((1, 59_339_169), (4, 59_339_940)):
        net = DeepLab(backbone="resnet", output_stride=16, num_classes=nc)
        v = jax.eval_shape(
            lambda k: net.init(k, jnp.zeros((1, 64, 64, 3))),
            jax.random.PRNGKey(0))
        got = param_count(v["params"])
        assert got == expect, (nc, got, expect)
    for bk, expect in (("xception", 54_700_177), ("drn", 40_731_921),
                       ("mobilenet", 5_810_913)):
        net = DeepLab(backbone=bk, output_stride=16, num_classes=1)
        v = jax.eval_shape(
            lambda k: net.init(k, jnp.zeros((1, 64, 64, 3))),
            jax.random.PRNGKey(0))
        got = param_count(v["params"])
        assert got == expect, (bk, got, expect)


def test_extra_backbones_forward():
    """xception/drn/mobilenet run at tiny spatial size."""
    x = jnp.zeros((1, 64, 64, 3))
    for bk in ("xception", "drn", "mobilenet"):
        net = DeepLab(backbone=bk, output_stride=16, num_classes=2)
        v = net.init(jax.random.PRNGKey(0), x)
        out = net.apply(v, x)
        assert out.shape == (1, 64, 64, 2), bk


def test_deeplab_tiny_forward():
    net = DeepLab(backbone="resnet", output_stride=16, num_classes=4,
                  resnet_layers=(1, 1, 1, 1))
    x = jnp.zeros((2, 64, 64, 3))
    v = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(v, x)
    assert out.shape == (2, 64, 64, 4)


def test_classhead_matches_jnp_forms():
    """sliced_argmax/sliced_nll (ops/classhead.py) match the canonical jnp
    forms — including FIRST-index tie semantics and the CE gradient (the
    sliced forms exist purely for TPU lane utilization, not new math)."""
    from seg2eye_tpu.ops.classhead import sliced_argmax, sliced_nll
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 8, 9, 4)).astype(np.float32)
    # force exact ties, incl. a global-max tie (argmax must pick the first)
    logits[0, 0, 0, :] = 1.5
    logits[1, 2, 3, 1] = logits[1, 2, 3, 3] = logits[1, 2, 3].max() + 1.0
    labels = rng.integers(0, 4, (2, 8, 9)).astype(np.int32)
    lj, tj = jnp.asarray(logits), jnp.asarray(labels)

    assert np.array_equal(np.asarray(jax.jit(sliced_argmax)(lj)),
                          np.asarray(jnp.argmax(lj, -1)))

    def ref_nll(lg):
        logp = jax.nn.log_softmax(lg, axis=-1)
        oh = jax.nn.one_hot(tj, lg.shape[-1], dtype=logp.dtype)
        return jnp.mean(-jnp.sum(logp * oh, -1))

    def new_nll(lg):
        nll, _ = sliced_nll(lg, tj)
        return jnp.mean(nll)

    v_ref, g_ref = jax.jit(jax.value_and_grad(ref_nll))(lj)
    v_new, g_new = jax.jit(jax.value_and_grad(new_nll))(lj)
    np.testing.assert_allclose(float(v_new), float(v_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-7)
    _, pred = jax.jit(sliced_nll)(lj, tj)
    assert np.array_equal(np.asarray(pred), np.asarray(jnp.argmax(lj, -1)))


def test_classhead_nll_poisons_out_of_range_labels():
    """An out-of-range label (corrupted data, 255-style ignore) must fail
    LOUDLY — NaN at exactly the bad pixels — not silently contribute class
    0's logit (round-2 advisor finding, ops/classhead.py)."""
    from seg2eye_tpu.ops.classhead import sliced_nll
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(1, 4, 5, 4)).astype(np.float32))
    labels = rng.integers(0, 4, (1, 4, 5)).astype(np.int32)
    labels[0, 1, 2] = 255                     # corrupted / ignore-style
    labels[0, 3, 0] = -1
    nll, _ = jax.jit(sliced_nll)(logits, jnp.asarray(labels))
    nll = np.asarray(nll)
    assert np.isnan(nll[0, 1, 2]) and np.isnan(nll[0, 3, 0])
    good = np.ones((1, 4, 5), bool)
    good[0, 1, 2] = good[0, 3, 0] = False
    assert np.isfinite(nll[good]).all()


@pytest.mark.parametrize("bk", ["resnet", "xception", "drn", "mobilenet"])
def test_deeplab_bf16_compute_propagates(bk):
    """The compute dtype follows the input through every backbone: a bf16
    input must come out bf16 (convs on the MXU at bf16 rate, params/BN f32)
    and match the f32 program within bf16 rounding.  Without the explicit
    dtype= threading flax promotes activations back to the f32 params and
    the whole DeepLab path silently computes in f32 (the pre-round-4 bug:
    compute_dtype='bfloat16' only cast the input)."""
    kw = dict(resnet_layers=(1, 1, 1, 1)) if bk == "resnet" else {}
    net = DeepLab(backbone=bk, output_stride=16, num_classes=2, **kw)
    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    v = jax.jit(net.init)(jax.random.PRNGKey(0), x32)
    out32 = jax.jit(net.apply)(v, x32)
    out16 = jax.jit(net.apply)(v, x32.astype(jnp.bfloat16))
    assert out16.dtype == jnp.bfloat16, bk
    diff = np.abs(np.asarray(out16, np.float32) - np.asarray(out32))
    scale = np.abs(np.asarray(out32)).max() + 1e-6
    assert diff.max() / scale < 0.1, (bk, diff.max(), scale)


def test_colorize_segmap():
    seg = np.array([[0, 1], [2, 3]], np.uint8)
    out = colorize_segmap(seg)
    np.testing.assert_array_equal(out, [[125, 103], [76, 34]])


def test_refinenet_dataset_joins(env):
    d, cfg = env
    ds = RefineNetDataset(cfg, "train")
    assert len(ds) == 6
    item = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert item["input"].shape == (64, 40, 3)
    assert item["target"].shape == (64, 40, 1)
    # native-size sources ride the uint8 device transport by default; the
    # f32 path must be the identical normalize of the same bytes
    assert item["input"].dtype == np.uint8
    ds32 = RefineNetDataset(cfg.replace(device_normalize=False), "train")
    item32 = ds32.__getitem__(0, rng=np.random.default_rng(0))
    assert -1 <= item32["input"].min() and item32["input"].max() <= 1
    np.testing.assert_allclose(
        item["input"].astype(np.float32) * (2.0 / 255.0) - 1.0,
        item32["input"], atol=1e-6)
    np.testing.assert_allclose(
        item["target"].astype(np.float32) * (2.0 / 255.0) - 1.0,
        item32["target"], atol=1e-6)
    # pick1 deterministic: top-1 neighbor
    ds1 = RefineNetDataset(cfg, "validation", pick1=True)
    a = ds1.__getitem__(0, rng=np.random.default_rng(1))
    b = ds1.__getitem__(0, rng=np.random.default_rng(2))
    np.testing.assert_array_equal(a["input"], b["input"])
    # test split requires pick1
    with pytest.raises(AssertionError):
        RefineNetDataset(cfg, "test", pick1=False)


def test_refinenet_drops_u111(tmp_path):
    data = schema.write_synthetic_h5(str(tmp_path / "d.h5"),
                                     users=("U001", "U111"), h=32, w=32)
    paths = write_synthetic_refinenet_fixtures(str(tmp_path), data)
    cfg = RefineNetConfig(dataroot=data, input_width=32, input_height=32,
                          **paths)
    ds = RefineNetDataset(cfg, "train")
    assert all(pid != "U111" for pid, _ in ds.idx_to_kv)
    # but U111 stays in validation
    ds_val = RefineNetDataset(cfg, "validation")
    assert any(pid == "U111" for pid, _ in ds_val.idx_to_kv)


def test_refinenet_model_outputs(env):
    d, cfg = env
    model = RefineNetModel(cfg)
    variables = model.init(jax.random.PRNGKey(0))
    batch = {
        "input": jnp.zeros((2, 64, 40, 3)),
        "target": jnp.zeros((2, 64, 40, 1)),
    }
    out, _ = jax.jit(lambda v, b: model.forward(v, b))(variables, batch)
    assert out["prediction"].shape == (2, 64, 40, 1)
    assert np.abs(np.asarray(out["prediction"])).max() <= 1.0
    # per-image score formula: inputs all zero, residual r ->
    # per_image = sqrt(sum((127.5 * clip(r))^2)) / (H*W)
    assert out["per_image_score"].shape == (2,)
    np.testing.assert_allclose(float(out["eds_loss"]),
                               float(np.mean(np.asarray(out["per_image_score"]))),
                               rtol=1e-6)
    np.testing.assert_allclose(float(out["score"]),
                               1471 * float(np.mean(np.asarray(out["per_image_score"]))),
                               rtol=1e-5)


def test_segnet_model_ce(env):
    d, cfg = env
    model = SegNetModel(cfg)
    variables = model.init(jax.random.PRNGKey(0))
    batch = {
        "input": jnp.zeros((2, 64, 40, 1)),
        "target": jnp.zeros((2, 64, 40), jnp.int32),
    }
    out, _ = jax.jit(lambda v, b: model.forward(v, b))(variables, batch)
    assert out["prediction"].shape == (2, 64, 40)
    # CE at uniform logits ~ log(4)
    assert abs(float(out["ce_loss"]) - np.log(4)) < 0.5


def test_lr_schedule():
    cfg = RefineNetConfig(batch_size=8, base_learning_rate=1e-3,
                          num_warmup_epochs=2, lr_decay_factor=0.5,
                          lr_decay_epoch_interval=5)
    spe = 10
    target = 8e-3
    base = 1e-3
    assert learning_rate_schedule(cfg, spe, 0) == pytest.approx(base)
    assert learning_rate_schedule(cfg, spe, 10) == pytest.approx(
        (base + target) / 2)
    assert learning_rate_schedule(cfg, spe, 20) == pytest.approx(target)
    # after warmup: decay 0.5 every 5 epochs
    assert learning_rate_schedule(cfg, spe, 20 + 50) == pytest.approx(
        target * 0.5)
    cyc = cfg.replace(lr_decay_strategy="cyclic")
    v = learning_rate_schedule(cyc, spe, 25)
    assert base <= v <= target


def test_test_split_subsampling(env):
    """Periodic test loaders honor test_num_samples
    (reference training.py:99-149)."""
    d, cfg = env
    ds = RefineNetDataset(cfg, "validation", pick1=True)
    sub = subsample(ds, 3, seed=0)
    assert len(sub) == 3
    item = sub.__getitem__(0, rng=np.random.default_rng(0))
    assert "input" in item
    # n >= len(dataset) -> unchanged
    assert subsample(ds, 10**6, seed=0) is ds
    assert subsample(ds, 0, seed=0) is ds


def test_test_model_on_all_standalone(env):
    """test_model_on_all works right after init_state — no attribute
    injection by main_loop needed (round-2 verdict: current_variables was
    only ever assigned at main_loop call sites)."""
    from seg2eye_tpu.refinenet.training import test_model_on_all
    d, cfg = env
    model = RefineNetModel(cfg)
    trainer = Trainer(model, cfg, loss_key="eds_loss")
    state = trainer.init_state(jax.random.PRNGKey(0))
    loader = DataLoader(RefineNetDataset(cfg, "validation", pick1=True),
                        batch_size=2, shuffle=False, drop_last=False,
                        prefetch=0)
    results = test_model_on_all(trainer, {"val": loader}, step=0)
    assert np.isfinite(results["val"]["eds_loss"])
    # update_variables points the eval helpers at a newer state
    trainer.update_variables(state)
    assert trainer.current_variables is state["variables"]


class _RecordingTensorboard:
    def __init__(self):
        self.images = []
        self.step = 0

    def update_current_step(self, step):
        self.step = step

    def add_image(self, tag, img):
        self.images.append((tag, self.step, np.asarray(img).shape))


def test_do_visualizations_strip_contents():
    """The training-observability strip (reference training.py:306-342):
    input channels | prediction | groundtruth + score footer."""
    b, h, w = 2, 16, 12
    rng = np.random.default_rng(0)
    out = {
        "input": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "prediction": rng.uniform(-1, 1, (b, h, w, 1)).astype(np.float32),
        "groundtruth": rng.uniform(-1, 1, (b, h, w, 1)).astype(np.float32),
        "per_image_score": np.array([0.5, 0.7], np.float32),
    }
    tb = _RecordingTensorboard()
    n = do_visualizations(out, tb, step=7, max_images=2)
    assert n == 2 and len(tb.images) == 2
    tag, step, shape = tb.images[0]
    assert step == 7
    # 3 input panels + prediction + groundtruth side by side, 60px footer
    assert shape == (1, h + 60, 5 * w)


def test_main_loop_end_to_end(env, monkeypatch):
    d, cfg = env
    cfg = cfg.replace(max_steps=2, test_every_n_steps=10**6,
                      tensorboard_images_every_n_steps=1)
    train_loader = DataLoader(RefineNetDataset(cfg, "train"),
                              batch_size=2, shuffle=True, drop_last=True,
                              prefetch=0)
    test_data = {"val/pick1": DataLoader(
        RefineNetDataset(cfg, "validation", pick1=True), batch_size=2,
        shuffle=False, drop_last=False, prefetch=0)}
    model = RefineNetModel(cfg)
    vis_calls = []
    import seg2eye_tpu.refinenet.training as training_mod
    real_vis = training_mod.do_visualizations
    monkeypatch.setattr(
        training_mod, "do_visualizations",
        lambda *a, **kw: vis_calls.append(real_vis(*a, **kw)))
    result = main_loop(model, cfg, train_loader, test_data,
                       loss_key="eds_loss", model_name="RefineNet")
    # the periodic image hook fired every step and logged real strips
    assert len(vis_calls) == 2 and all(n > 0 for n in vis_calls)
    assert result["steps"] == 2
    assert "val/pick1" in result["final"]
    assert np.isfinite(result["final"]["val/pick1"]["eds_loss"])
    out_dir = result["output_dir"]
    assert os.path.exists(os.path.join(out_dir, "config.json"))
    assert os.path.exists(os.path.join(out_dir, "gsheet_rows.jsonl"))
    ckpts = os.listdir(os.path.join(out_dir, "checkpoints"))
    assert any(c.endswith(".ckpt") for c in ckpts)
    # resume path
    cfg2 = cfg.replace(resume_from=out_dir, max_steps=1)
    result2 = main_loop(model, cfg2, train_loader, test_data,
                        loss_key="eds_loss", model_name="RefineNet")
    assert result2["steps"] == 3


def test_main_loop_sigterm_preemption_checkpoints(env):
    """SIGTERM mid-loop (cloud-TPU eviction) saves the CURRENT step's
    checkpoint and returns interrupted=True, skipping the final full test
    (the reference RefineNet loop has no crash-safety at all — a preempted
    run lost everything since the last test_every_n_steps checkpoint)."""
    import signal

    d, cfg = env
    cfg = cfg.replace(max_steps=5, test_every_n_steps=10**6,
                      tensorboard_images_every_n_steps=0)
    train_loader = DataLoader(RefineNetDataset(cfg, "train"),
                              batch_size=2, shuffle=True, drop_last=True,
                              prefetch=0)
    test_data = {"val/pick1": DataLoader(
        RefineNetDataset(cfg, "validation", pick1=True), batch_size=2,
        shuffle=False, drop_last=False, prefetch=0)}
    before = signal.getsignal(signal.SIGTERM)

    def cb(step, scalars, out, batch):
        if step == 1:                      # second step (0-based)
            os.kill(os.getpid(), signal.SIGTERM)

    result = main_loop(RefineNetModel(cfg), cfg, train_loader, test_data,
                       loss_key="eds_loss", model_name="RefineNet",
                       step_callback=cb)
    assert result["interrupted"] is True
    assert result["steps"] == 2           # preempted after step index 1
    assert result["final"] == {}          # final full test skipped
    ckpts = os.listdir(os.path.join(result["output_dir"], "checkpoints"))
    assert "0000002.ckpt" in ckpts, ckpts
    assert signal.getsignal(signal.SIGTERM) == before


def test_dp_step_matches_single_device(env):
    """R8 SyncBN-by-GSPMD, proven on the RefineNet trainer itself: two DP
    train steps on a 4-device data mesh produce the same losses and
    parameters as single-device on the same global batch (batch-norm stats
    and gradient means psum over the sharded axis — identical math, only
    reduction order differs)."""
    from seg2eye_tpu.parallel.sharding import make_mesh
    from seg2eye_tpu.refinenet.training import device_batch

    d, cfg = env
    model = RefineNetModel(cfg)
    rng = np.random.default_rng(0)
    batches = [{
        "input": rng.uniform(-1, 1, (4, 64, 40, 3)).astype(np.float32),
        "target": rng.uniform(-1, 1, (4, 64, 40, 1)).astype(np.float32),
    } for _ in range(2)]

    def run(mesh):
        # donate=False: this test keeps every post-step state alive for the
        # final param comparison; donation would invalidate them on TPU
        trainer = Trainer(model, cfg, loss_key="eds_loss", mesh=mesh,
                          donate=False)
        state = trainer.init_state(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        scals, states = [], []
        for b in batches:
            key, sub = jax.random.split(key)
            state, scal, _ = trainer.train_step(
                state, device_batch(b, mesh), jnp.asarray(1e-3), sub)
            scals.append({k: float(v) for k, v in scal.items()})
            states.append(state)
        return states, scals

    st1, sc1 = run(None)
    st2, sc2 = run(make_mesh(None, data=4, model=1))
    # per-step losses track (chaotic rounding amplification bounds this
    # looser at step 2 — the bitwise question is settled by the 1-step
    # param check below; trajectory-level equivalence over hundreds of
    # steps is the convergence-twin evidence, evidence/convergence_dp8.jsonl)
    for a, b in zip(sc1, sc2):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=5e-4, atol=1e-5,
                                       err_msg=k)
    p1 = jax.tree_util.tree_leaves(st1[0]["variables"]["params"])
    p2 = jax.tree_util.tree_leaves(st2[0]["variables"]["params"])
    worst = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                for a, b in zip(p1, p2))
    assert worst < 5e-5, worst  # one full SGD update: measured 8.7e-6


def test_dataset_seq_ranking_without_seq_segmentations_errors(env):
    """A train-split ranking entry pointing into the sequence subset while
    cfg.segmentations_sequence is unset must raise a clear configuration
    error, not a NoneType subscript crash inside the loader thread
    (dataset.py _open conditionally skips the file; __getitem__ guards)."""
    d, base = env
    cfg = base.replace(segmentations_sequence="")
    ds = RefineNetDataset(cfg, split="train")
    rng = np.random.default_rng(0)
    with pytest.raises(ValueError, match="segmentations_sequence"):
        # the synthetic train ranking mixes 'g' and 's' rows; some index
        # must hit the sequence subset
        for i in range(len(ds)):
            for _ in range(8):          # pick1=False draws randomly
                ds.__getitem__(i, rng=rng)
