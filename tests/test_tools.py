"""Tests for repo tools (imported by path — tools/ is not a package)."""
import importlib.util
import os

import h5py
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, "tools", name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_build_style_ranking_groups_match_consumer_lookup(tmp_path):
    """The ranking H5's group names must equal what RefineNetDataset looks
    up: labels_{ss,gen}_filenames decoded + '.'-stripped (dataset.py
    __getitem__) — NOT images_ss_filenames, which only coincides for
    exactly-12-char OpenEDS ids via the S13 truncation accident.  Short
    ids with deliberately different image-filename spellings prove the
    keying source."""
    rng = np.random.default_rng(0)
    data = tmp_path / "data.h5"
    with h5py.File(data, "w") as f:
        g = f.create_group("train/u1")
        g.create_dataset("labels_ss",
                         data=rng.integers(0, 4, (2, 16, 16), dtype=np.uint8))
        g.create_dataset(
            "labels_ss_filenames",
            data=np.array([b"12345.png", b"9.png"], dtype="S13"))
        # different spelling on purpose: extension-stripped (what prep
        # stores for images); keying on THIS would produce groups the
        # consumer can never find for sub-12-char ids
        g.create_dataset("images_ss_filenames",
                         data=np.array([b"12345", b"9"], dtype="S13"))
    segs = tmp_path / "segs.h5"
    with h5py.File(segs, "w") as f:
        f.create_dataset(
            "train/u1",
            data=rng.integers(0, 4, (3, 16, 16), dtype=np.uint8))

    out = tmp_path / "rank.h5"
    bsr = _load_tool("build_style_ranking")
    bsr.main(["--dataroot", str(data),
              "--segmentations_generative", str(segs),
              "--out", str(out), "--splits", "train"])

    with h5py.File(out, "r") as f:
        for fname in ("12345png", "9png"):     # consumer transformation
            grp = f["train/u1"][fname]
            assert grp["index"].shape == (3,)
            assert set(grp["subset"][:]) == {b"g"}
            d = grp["distance"][:]
            assert np.all(np.diff(d) >= -1e-9)  # sorted ascending


def test_peak_flops_device_keyed():
    """MFU denominators come from the device kind — unknown chips must
    yield 0.0 (callers print 'n/a'), never a wrong hardcoded peak."""
    from seg2eye_tpu.utils.roofline import peak_flops

    class D:
        def __init__(self, kind):
            self.device_kind = kind

    assert peak_flops(D("TPU v5 lite")) == 197e12
    assert peak_flops(D("TPU v4")) == 275e12
    assert peak_flops(D("TPU v6 lite")) == 918e12
    assert peak_flops(D("cpu")) == 0.0
    assert peak_flops(D("TPU v7x")) == 0.0


def test_export_torch_checkpoint_cli(tmp_path, monkeypatch):
    """CLI writes reference-named .pth files torch can load, from our
    msgpack .ckpt files, inferring num_D/n_layers_D from the tree."""
    import sys

    import flax.serialization
    import jax
    import jax.numpy as jnp
    import torch

    from seg2eye_tpu.models.discriminator import MultiscaleDiscriminator
    from seg2eye_tpu.models.encoder import ConvEncoder
    from seg2eye_tpu.models.generator import SpadeStyleGenerator

    def tpl(module, *args):
        shapes = jax.eval_shape(module.init, jax.random.PRNGKey(0), *args)
        return jax.tree_util.tree_map(
            lambda s: np.full(s.shape, 0.25, s.dtype), shapes)

    expr = tmp_path / "ck" / "exp"
    expr.mkdir(parents=True)
    trees = {
        "G": tpl(SpadeStyleGenerator(ngf=4, crop_size=64, aspect_ratio=1.0,
                                     w_dim=8),
                 jnp.zeros((1, 64, 64, 4)), jnp.zeros((1, 8))),
        "E": tpl(ConvEncoder(ngf=4, w_dim=8, crop_size=256),
                 jnp.zeros((1, 32, 32, 1))),
        "D": tpl(MultiscaleDiscriminator(ndf=4, num_d=2, n_layers=4),
                 jnp.zeros((1, 32, 32, 5))),
    }
    for net, v in trees.items():
        (expr / f"latest_net_{net}.ckpt").write_bytes(
            flax.serialization.to_bytes(v))

    out = tmp_path / "pth"
    monkeypatch.setattr(sys, "argv", [
        "export_torch_checkpoint.py", "--checkpoints_dir",
        str(tmp_path / "ck"), "--name", "exp", "--out_dir", str(out)])
    _load_tool("export_torch_checkpoint").main()

    for net, probe in (("G", "fc.weight"), ("E", "layer0.0.weight_orig"),
                       ("D", "discriminator_1.model4.0.weight")):
        sd = torch.load(out / f"latest_net_{net}.pth", map_location="cpu")
        assert probe in sd, (net, sorted(sd)[:5])
        assert all(isinstance(v, torch.Tensor) for v in sd.values())


def test_probe_xla_flags_child_template_is_valid_python():
    """The flag probe spawns its child from a .format()ed template — a
    stray brace would only fail after a 10-minute TPU compile wait, so pin
    it here."""
    import ast

    mod = _load_tool("probe_xla_flags")
    child = mod._CHILD.format(repo="/some/repo")
    ast.parse(child)
    assert set(mod.VARIANTS) >= {"default"}


def test_export_torch_checkpoint_cli_refinenet_dir(tmp_path, monkeypatch):
    """The --refinenet_dir path: newest %07d.ckpt (the CheckpointManager's
    {"variables", "opt", ...} state) exports to a %07d.pt raw state_dict —
    the format the reference CheckpointManager.__save writes / __load
    strict-loads (refinenet/core/checkpoint_manager.py:20-36)."""
    import sys

    import flax.serialization
    import jax
    import jax.numpy as jnp
    import torch

    from seg2eye_tpu.models.deeplab import DeepLab

    net = DeepLab(backbone="resnet", num_classes=1,
                  resnet_layers=(1, 1, 1, 1))
    shapes = jax.eval_shape(net.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)))
    variables = jax.tree_util.tree_map(
        lambda s: np.full(s.shape, 0.25, s.dtype), shapes)

    run = tmp_path / "run" / "checkpoints"
    run.mkdir(parents=True)
    # older ckpt must be ignored in favor of the newest
    (run / "0000002.ckpt").write_bytes(b"not even msgpack")
    (run / "0000007.ckpt").write_bytes(flax.serialization.to_bytes(
        {"variables": variables, "opt": {"count": np.int32(7)}}))

    out = tmp_path / "pt"
    monkeypatch.setattr(sys, "argv", [
        "export_torch_checkpoint.py", "--refinenet_dir", str(run),
        "--backbone", "resnet", "--out_dir", str(out)])
    _load_tool("export_torch_checkpoint").main()

    sd = torch.load(out / "0000007.pt", map_location="cpu")
    assert "backbone.conv1.weight" in sd
    assert "decoder.last_conv.8.weight" in sd, sorted(sd)[-6:]
    assert sd["decoder.last_conv.8.weight"].shape[0] == 1  # residual head
    assert any(k.endswith("num_batches_tracked") for k in sd)


def test_wants_platform_both_spellings():
    """The pre-jax argv scan must accept both forms argparse accepts —
    an equals-form '--platform=tpu' evidence run silently pinned to CPU
    is exactly the failure this guards (tools/*_precision_twin.py)."""
    from seg2eye_tpu.utils.platform import wants_platform
    assert wants_platform(["x", "--platform", "tpu"], "tpu")
    assert wants_platform(["x", "--platform=tpu"], "tpu")
    assert not wants_platform(["x", "--platform", "cpu"], "tpu")
    assert not wants_platform(["x", "--platform=cpu"], "tpu")
    assert not wants_platform(["x", "--platform"], "tpu")  # dangling flag
    assert not wants_platform(["x"], "tpu")
    # contradictory argv resolves like argparse: last occurrence wins
    assert not wants_platform(["x", "--platform", "tpu",
                               "--platform", "cpu"], "tpu")
    assert wants_platform(["x", "--platform=cpu", "--platform", "tpu"],
                          "tpu")


def test_device_timeit_shared_helper():
    """One shared honest-sync timer (seg2eye_tpu/utils/timing.py) backs
    every bench tool; it must handle array and tuple outputs alike."""
    import jax
    import jax.numpy as jnp

    from seg2eye_tpu.utils.timing import device_timeit

    f_arr = jax.jit(lambda x: x * 2.0)
    f_tup = jax.jit(lambda x: (x + 1.0, x - 1.0))
    x = jnp.ones((4, 4), jnp.float32)
    assert device_timeit(f_arr, (x,), iters=2) > 0.0
    assert device_timeit(f_tup, (x,), iters=2) > 0.0
    # the bench tools import it under the local name `timeit`
    for tool in ("bench_inference", "bench_serving_artifact",
                 "bench_refinenet_serving", "serving_stats_study"):
        path = os.path.join(ROOT, "tools", tool + ".py")
        src = open(path).read()
        assert "device_timeit" in src and "def timeit" not in src, tool


def test_measured_step_s_prefers_newest_parsed_bench(tmp_path):
    """The dryrun DP projection's denominator tracks the newest parsed
    BENCH_r*.json instead of a hardcoded constant going stale."""
    import json
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(ROOT, "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # empty dir -> fallback default
    assert mod._measured_step_s(default=0.5, repo=str(tmp_path)) == 0.5

    (tmp_path / "BENCH_r01.json").write_text(json.dumps(
        {"rc": 0, "parsed": {"step_ms": 200.0}}))
    (tmp_path / "BENCH_r02.json").write_text(json.dumps(
        {"rc": 1, "parsed": None}))                       # crash round: skip
    (tmp_path / "BENCH_r03.json").write_text(json.dumps(
        {"rc": 0, "parsed": {"step_ms": 150.0}}))         # newest parsed wins
    (tmp_path / "BENCH_r04.json").write_text("not json")  # unreadable: skip
    assert mod._measured_step_s(repo=str(tmp_path)) == 0.150


def test_ref_compat_adam_shim_restores_on_exception():
    """tools/_ref_compat.float_betas_adam must restore torch.optim.Adam
    even when the wrapped block raises (a leaked shim would silently
    change every later optimizer construction in the process), and the
    shim itself must float-cast the reference's mixed (0, 0.9) betas
    (pix2pix_model.py:102) that torch>=2.x rejects."""
    import torch

    rc = _load_tool("_ref_compat")
    orig = torch.optim.Adam
    try:
        with rc.float_betas_adam():
            shim = torch.optim.Adam
            assert shim is not orig
            p = torch.nn.Parameter(torch.zeros(2))
            opt = shim([p], lr=1e-3, betas=(0, 0.9), weight_decay=0.0)
            assert opt.param_groups[0]["betas"] == (0.0, 0.9)
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert torch.optim.Adam is orig


def test_ref_compat_torchvision_stub_idempotent(monkeypatch):
    """stub_torchvision must install importable stub modules and be safe
    to call twice (setdefault semantics — a second tool in the same
    process must not clobber the first stub)."""
    import sys

    rc = _load_tool("_ref_compat")
    monkeypatch.delitem(sys.modules, "torchvision", raising=False)
    monkeypatch.delitem(sys.modules, "torchvision.transforms", raising=False)
    rc.stub_torchvision()
    first = sys.modules["torchvision"]
    rc.stub_torchvision()
    assert sys.modules["torchvision"] is first
    import torchvision.transforms as tr
    assert tr.Compose is object
    monkeypatch.delitem(sys.modules, "torchvision", raising=False)
    monkeypatch.delitem(sys.modules, "torchvision.transforms", raising=False)
