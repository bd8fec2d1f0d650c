"""Checkpoint converter: mapping/shape handling on a synthetic torch-style
state_dict (full numerical forward equivalence vs the actual PyTorch
reference is checked by tools/check_reference_parity.py — PASS, see
PARITY.md)."""
import jax
import jax.numpy as jnp
import numpy as np

from seg2eye_tpu.models.encoder import ConvEncoder
from seg2eye_tpu.utils import torch_convert as tc


def test_perm_v_roundtrip():
    w = np.zeros((8, 3, 4, 4))              # OIHW
    v = np.arange(3 * 4 * 4).astype(np.float32)
    vp = tc._perm_v(v, w)
    # element (i,kh,kw) must land at (kh,kw,i)
    src = v.reshape(3, 4, 4)
    dst = vp.reshape(4, 4, 3)
    np.testing.assert_array_equal(dst[2, 1, 0], src[0, 2, 1])


def test_encoder_conversion_shapes_and_fc_permutation():
    enc = ConvEncoder(ngf=4, w_dim=8, crop_size=256)
    template = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    rng = np.random.default_rng(0)
    widths = [(1, 4), (4, 8), (8, 16), (16, 32), (32, 32), (32, 32)]
    sd = {}
    for i, (ci, co) in enumerate(widths):
        sd[f"layer{i}.0.weight_orig"] = rng.normal(
            size=(co, ci, 3, 3)).astype(np.float32)
        sd[f"layer{i}.0.weight_u"] = rng.normal(size=(co,)).astype(np.float32)
        sd[f"layer{i}.0.weight_v"] = rng.normal(
            size=(ci * 9,)).astype(np.float32)
    for fc in ("fc_mu", "fc_var"):
        sd[f"{fc}.weight"] = rng.normal(
            size=(8, 32 * 4 * 4)).astype(np.float32)
        sd[f"{fc}.bias"] = rng.normal(size=(8,)).astype(np.float32)
    v = tc.convert_encoder(sd, template, w_dim=8)
    # conv kernel transposed OIHW->HWIO
    np.testing.assert_array_equal(
        np.asarray(v["params"]["layer0"]["kernel"]),
        np.transpose(sd["layer0.0.weight_orig"], (2, 3, 1, 0)))
    # fc input axis permuted CHW->HWC: weight for torch input (c,h,w) must
    # land at flax input index (h,w,c)
    wt = sd["fc_mu.weight"].reshape(8, 32, 4, 4)
    wf = np.asarray(v["params"]["fc_mu"]["kernel"])  # (4*4*32, 8)
    wf = wf.reshape(4, 4, 32, 8)
    np.testing.assert_allclose(wf[1, 2, 5, :], wt[:, 5, 1, 2], rtol=1e-6)


# --------------------------------------------------------------------- #
# Reverse export (utils/torch_export.py): torch_convert must restore a
# torch_export dump bitwise.  The convert-back template is all-zeros, so
# any leaf either converter skipped shows up as a zero-vs-random mismatch
# (random fills are unique with probability ~1).

from seg2eye_tpu.utils import torch_export as te  # noqa: E402


def _template(module, *args):
    var_shapes = jax.eval_shape(module.init, jax.random.PRNGKey(0), *args)
    return jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), var_shapes)


def _unique_fill(template, seed=0):
    rng = np.random.default_rng(seed)
    return jax.tree_util.tree_map(
        lambda z: rng.normal(size=z.shape).astype(z.dtype) + 0.5, template)


def _assert_trees_equal(a, b, context=""):
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = jax.tree_util.tree_flatten_with_path(b)[0]
    assert len(fa) == len(fb)
    for (pa, va), (_, vb) in zip(fa, fb):
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(vb),
            err_msg=f"{context}{jax.tree_util.keystr(pa)}")


def test_generator_export_roundtrip():
    from seg2eye_tpu.models.generator import SpadeStyleGenerator
    g = SpadeStyleGenerator(ngf=4, crop_size=128, aspect_ratio=1.0, w_dim=8,
                            num_upsampling_layers="most")  # covers up_4 too
    tpl = _template(g, jnp.zeros((1, 128, 128, 4)), jnp.zeros((1, 8)))
    v = _unique_fill(tpl)
    back = tc.convert_generator(te.export_generator(v), tpl)
    _assert_trees_equal(v, back, "G ")


def test_encoder_export_roundtrip():
    enc = ConvEncoder(ngf=4, w_dim=8, crop_size=256)
    tpl = _template(enc, jnp.zeros((1, 32, 32, 1)))
    v = _unique_fill(tpl)
    back = tc.convert_encoder(te.export_encoder(v), tpl, w_dim=8)
    _assert_trees_equal(v, back, "E ")


def test_discriminator_export_roundtrip():
    from seg2eye_tpu.models.discriminator import MultiscaleDiscriminator
    d = MultiscaleDiscriminator(ndf=4)
    tpl = _template(d, jnp.zeros((1, 32, 32, 5)))
    v = _unique_fill(tpl)
    back = tc.convert_discriminator(te.export_discriminator(v), tpl)
    _assert_trees_equal(v, back, "D ")


def test_deeplab_export_roundtrip_all_backbones():
    from seg2eye_tpu.models.deeplab import DeepLab
    for backbone, kw in (("resnet", {"resnet_layers": (1, 1, 1, 1)}),
                         ("xception", {}), ("drn", {}), ("mobilenet", {})):
        net = DeepLab(backbone=backbone, num_classes=4, **kw)
        tpl = _template(net, jnp.zeros((1, 64, 64, 3)))
        v = _unique_fill(tpl)
        back = tc.convert_deeplab(te.export_deeplab(v, backbone=backbone),
                                  tpl, backbone=backbone)
        _assert_trees_equal(v, back, f"{backbone} ")


def test_vgg19_export_roundtrip():
    from seg2eye_tpu.models.vgg import VGG19Features
    net = VGG19Features()
    tpl = _template(net, jnp.zeros((1, 32, 32, 3), jnp.float32))
    v = _unique_fill(tpl)
    back = tc.convert_vgg19(te.export_vgg19(v), tpl)
    _assert_trees_equal(v, back, "vgg ")


def test_export_emits_bn_bookkeeping_keys():
    """Strict torch loads require num_batches_tracked for every tracked BN."""
    from seg2eye_tpu.models.deeplab import DeepLab
    net = DeepLab(backbone="resnet", num_classes=4,
                  resnet_layers=(1, 1, 1, 1))
    tpl = _template(net, jnp.zeros((1, 64, 64, 3)))
    sd = te.export_deeplab(_unique_fill(tpl), backbone="resnet")
    tracked = [k for k in sd if k.endswith("num_batches_tracked")]
    means = [k for k in sd if k.endswith("running_mean")]
    assert len(tracked) == len(means) and tracked
    assert all(sd[k].dtype == np.int64 for k in tracked)


def test_mobilenet_export_emits_alias_families():
    """The reference MobileNetV2 registers the same modules as features.*
    AND low/high_level_features.* (mobilenet.py:107-114) — strict torch
    loads need all three key families, with identical values."""
    from seg2eye_tpu.models.deeplab import MobileNetBackbone
    net = MobileNetBackbone()
    tpl = _template(net, jnp.zeros((1, 64, 64, 3)))
    sd = te.export_mobilenet_backbone(_unique_fill(tpl))
    feats = [k for k in sd if k.startswith("features.")]
    assert feats
    for k in feats:
        idx = int(k.split(".")[1])
        fam = "low_level_features" if idx < 4 else "high_level_features"
        alias = f"{fam}." + k.split(".", 1)[1]
        assert alias in sd, alias
        np.testing.assert_array_equal(sd[alias], sd[k])
    # and nothing else leaks in
    known = {"features", "low_level_features", "high_level_features"}
    assert {k.split(".")[0] for k in sd} == known


def test_batch_subnorm_export_roundtrip():
    """flax -> torch -> flax over every leaf of the spectralbatch variants
    (round 4): the BN scale/bias/mean/var of SubNorm's TorchBatchNorm must
    survive the round trip — a silently skipped BN leaf shows up as a
    zero-vs-random mismatch (same methodology as the default-norm
    round-trips above).  Reference layout: get_nonspade_norm_layer builds
    Sequential(spectral conv, affine BatchNorm2d), normalization.py:15-47."""
    from seg2eye_tpu.models.discriminator import MultiscaleDiscriminator

    d = MultiscaleDiscriminator(ndf=4, norm_d="spectralbatch")
    tpl = _template(d, jnp.zeros((1, 32, 32, 5)))
    v = _unique_fill(tpl)
    sd = te.export_discriminator(v)
    assert "discriminator_0.model1.0.1.weight" in sd
    assert "discriminator_0.model1.0.1.running_var" in sd
    back = tc.convert_discriminator(sd, tpl)
    _assert_trees_equal(v, back, "D(batch) ")

    enc = ConvEncoder(ngf=4, w_dim=8, crop_size=256, norm_e="spectralbatch")
    tpl = _template(enc, jnp.zeros((1, 32, 32, 1)))
    v = _unique_fill(tpl)
    sd = te.export_encoder(v)
    assert "layer0.1.weight" in sd and "layer0.1.running_mean" in sd
    back = tc.convert_encoder(sd, tpl, w_dim=8)
    _assert_trees_equal(v, back, "E(batch) ")


def test_none_subnorm_export_roundtrip():
    """spectralnone round trip (round 4): the reference's add_norm_layer
    returns the conv DIRECTLY for ''/none (no Sequential wrapper, bias
    kept, normalization.py:26-28), so the exporter emits flat model{n}.0.*
    keys and the converter detects the layout and reads the bias back."""
    from seg2eye_tpu.models.discriminator import MultiscaleDiscriminator

    d = MultiscaleDiscriminator(ndf=4, norm_d="spectralnone")
    tpl = _template(d, jnp.zeros((1, 32, 32, 5)))
    v = _unique_fill(tpl)
    sd = te.export_discriminator(v)
    assert "discriminator_0.model1.0.weight_orig" in sd
    assert "discriminator_0.model1.0.bias" in sd
    assert "discriminator_0.model1.0.0.weight_orig" not in sd
    back = tc.convert_discriminator(sd, tpl)
    _assert_trees_equal(v, back, "D(none) ")

    enc = ConvEncoder(ngf=4, w_dim=8, crop_size=256, norm_e="spectralnone")
    tpl = _template(enc, jnp.zeros((1, 32, 32, 1)))
    v = _unique_fill(tpl)
    sd = te.export_encoder(v)
    assert "layer0.0.bias" in sd
    back = tc.convert_encoder(sd, tpl, w_dim=8)
    _assert_trees_equal(v, back, "E(none) ")
