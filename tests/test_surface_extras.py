"""Coverage of the remaining reference surfaces: preprocess modes, non-spade
norm variants, init types, gaze math, pupil annotation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seg2eye_tpu.data import transforms as T
from seg2eye_tpu.models.discriminator import NLayerDiscriminator
from seg2eye_tpu.models.encoder import ConvEncoder
from seg2eye_tpu.models.layers import parse_nonspade_norm, weight_init
from seg2eye_tpu.options import Options
from seg2eye_tpu.utils import gaze
from seg2eye_tpu.utils.visualizer import annotate_pupil


def opt_for(mode, **kw):
    base = dict(preprocess_mode=mode, load_size=48, crop_size=32,
                aspect_ratio=1.0, isTrain=True, no_flip=True)
    base.update(kw)
    return Options(**base).finalize()


def test_preprocess_modes():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 40), dtype=np.uint8)
    cases = {
        "fixed": (32, 32),
        "resize_and_crop": (32, 32),
        "scale_width_and_crop": (32, 32),
        "scale_shortside_and_crop": (32, 32),
        "crop": (32, 32),
        "none": (64, 32),                   # rounded to multiples of 32
        "scale_width": (48 * 64 // 40, 48),
    }
    for mode, (eh, ew) in cases.items():
        opt = opt_for(mode)
        params = T.get_params(opt, rng, size=(40, 64))
        out = T.transform_image(img, opt, params)
        assert out.shape == (eh, ew, 1), (mode, out.shape)
        m = T.transform_mask((img % 4).astype(np.uint8), opt, params)
        assert m.shape == (eh, ew), mode


def test_crop_pos_shared():
    rng = np.random.default_rng(1)
    opt = opt_for("resize_and_crop", no_flip=False)
    params = T.get_params(opt, rng, size=(40, 64))
    assert 0 <= params["crop_pos"][0] <= 48 - 32


def test_parse_nonspade_norm():
    assert parse_nonspade_norm("spectralinstance") == (True, "instance")
    assert parse_nonspade_norm("spectralbatch") == (True, "batch")
    assert parse_nonspade_norm("instance") == (False, "instance")
    assert parse_nonspade_norm("spectral") == (True, "")
    with pytest.raises(ValueError):
        parse_nonspade_norm("spectralbogus")


def test_norm_variants_run():
    x = jnp.zeros((2, 32, 32, 5))
    for norm in ("spectralinstance", "spectralbatch", "spectralnone",
                 "instance"):
        d = NLayerDiscriminator(ndf=4, norm_d=norm)
        v = d.init(jax.random.PRNGKey(0), x)
        if "batch" in norm:
            out, _ = d.apply(v, x, mutable=["batch_stats"])
        else:
            out = d.apply(v, x)
        assert out[-1].shape[-1] == 1, norm
    # batch variant adds affine BN params; none removes them but keeps bias
    vb = NLayerDiscriminator(ndf=4, norm_d="spectralbatch").init(
        jax.random.PRNGKey(0), x)
    assert "norm1" in vb["params"]
    vn = NLayerDiscriminator(ndf=4, norm_d="spectralnone").init(
        jax.random.PRNGKey(0), x)
    assert "bias" in vn["params"]["model1_conv"]


def test_init_types():
    for it in ("xavier", "normal", "xavier_uniform", "kaiming",
               "orthogonal", "none"):
        init = weight_init(it, 0.02)
        w = init(jax.random.PRNGKey(0), (3, 3, 4, 8))
        assert np.isfinite(np.asarray(w)).all(), it
    with pytest.raises(NotImplementedError):
        weight_init("bogus")


def test_encoder_batch_norm_variant():
    enc = ConvEncoder(ngf=4, w_dim=8, crop_size=256, norm_e="spectralbatch")
    x = jnp.zeros((1, 32, 32, 1))
    v = enc.init(jax.random.PRNGKey(0), x)
    (mu, logvar, feats), _ = enc.apply(v, x, mutable=["batch_stats"])
    assert mu.shape == (1, 8)
    assert "batch_stats" in v


def test_gaze_roundtrip():
    py = np.array([[0.1, -0.2], [0.3, 0.5]])
    vec = gaze.pitchyaw_to_vector(py)
    back = gaze.vector_to_pitchyaw(vec)
    np.testing.assert_allclose(back, py, atol=1e-6)
    err = gaze.angular_error(py, py)
    assert np.all(err < 0.1)
    err_j = np.asarray(gaze.angular_error_jax(jnp.asarray(py),
                                              jnp.asarray(py)))
    # identical inputs sit at the arccos clamp; f32 vs f64 differ slightly
    np.testing.assert_allclose(err_j, err, atol=0.1)


def test_annotate_pupil():
    img = np.zeros((20, 20), np.float32)
    label = np.zeros((20, 20), np.uint8)
    label[8:12, 8:12] = 3
    out = annotate_pupil(img, label)
    assert out.max() > 0          # crosshair drawn
    out2 = annotate_pupil(img, np.zeros_like(label))
    assert out2.max() == 0        # no pupil, unchanged


def test_pix2pix_inference_with_batch_subnorm_encoder():
    """End-to-end inference with norm_E='spectralbatch' (round-4 fix):
    encode_w's eval branch must run torch-train-mode batch-stat BN via
    mutable-discard (it previously raised on the running-stat write), and
    eval_use_running_stats must switch the encoder to running stats —
    the two modes must actually differ on non-degenerate input."""
    import jax

    from seg2eye_tpu.models.pix2pix import Pix2Pix
    from seg2eye_tpu.options import Options

    rng = np.random.default_rng(11)
    batch = {
        "label": jnp.asarray(rng.integers(0, 4, (2, 64, 64))),
        "style_image": jnp.asarray(
            rng.uniform(-1, 1, (2, 2, 64, 64, 1)).astype(np.float32)),
    }
    outs = {}
    for ura in (False, True):
        opt = Options(ngf=4, ndf=4, w_dim=8, crop_size=64, aspect_ratio=1.0,
                      label_nc=4, input_ns=2, compute_dtype="float32",
                      norm_E="spectralbatch",
                      eval_use_running_stats=ura).finalize()
        model = Pix2Pix(opt)
        v = model.init_variables(jax.random.PRNGKey(0))
        outs[ura] = np.asarray(jax.jit(model.inference)(v, batch))
        assert np.isfinite(outs[ura]).all()
    # batch-stat vs running-stat (fresh mean 0 / var 1) encodings differ
    assert np.abs(outs[False] - outs[True]).max() > 1e-6
