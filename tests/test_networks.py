"""Shape / parameter-count / statistics tests for the three networks.

Expected parameter counts are computed analytically from the reference
architecture tables (SURVEY.md §2 C5-C9) and cross-checked once against the
PyTorch reference (see tools/check_reference_parity.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seg2eye_tpu.models.discriminator import MultiscaleDiscriminator
from seg2eye_tpu.models.encoder import ConvEncoder
from seg2eye_tpu.models.generator import SpadeStyleGenerator, upsample2x
from seg2eye_tpu.models.layers import param_count
from seg2eye_tpu.models.pix2pix import Pix2Pix
from seg2eye_tpu.options import Options


def small_opt(**kw):
    base = dict(ngf=4, ndf=4, crop_size=32, aspect_ratio=1.0, batchSize=2,
                input_ns=2, w_dim=8, compute_dtype="float32", isTrain=True)
    base.update(kw)
    return Options(**base).finalize()


def test_generator_shapes():
    # crop 32 / aspect 1.0: sh=sw=1, five 2x upsamples -> 32x32 out
    gen = SpadeStyleGenerator(ngf=4, crop_size=32, aspect_ratio=1.0)
    seg = jnp.zeros((2, 32, 32, 4))
    w = jnp.zeros((2, 16))
    vars_ = gen.init(jax.random.PRNGKey(0), seg, w)
    out, _ = gen.apply(vars_, seg, w, mutable=["batch_stats"])
    assert out.shape == (2, 32, 32, 1)
    assert np.all(np.abs(np.asarray(out)) <= 1.0)
    # mutable collections exist
    assert "spectral" in vars_ and "batch_stats" in vars_


def test_generator_full_res_latent_size():
    gen = SpadeStyleGenerator(ngf=64, crop_size=256)
    assert gen.latent_size() == (10, 8)   # generator.py:52-67 at crop 256
    gen_most = SpadeStyleGenerator(ngf=64, crop_size=256,
                                   num_upsampling_layers="most")
    assert gen_most.latent_size() == (2, 2)


def test_upsample2x_exact_nearest():
    x = jnp.arange(8.0).reshape(1, 2, 2, 2)
    y = upsample2x(x)
    assert y.shape == (1, 4, 4, 2)
    np.testing.assert_array_equal(np.asarray(y[0, :, :, 0]),
                                  np.repeat(np.repeat(np.asarray(x[0, :, :, 0]), 2, 0), 2, 1))


def test_encoder_shapes_and_features():
    # crop_size < 256 -> 5 conv layers, but the 256x256 input resize always
    # happens (encoder.py:53-55); use tiny channel widths for speed
    enc = ConvEncoder(ngf=2, w_dim=8, crop_size=256)
    x = jnp.zeros((3, 40, 32, 1))
    vars_ = enc.init(jax.random.PRNGKey(0), x)
    mu, logvar, feats = enc.apply(vars_, x)
    assert mu.shape == (3, 8) and logvar.shape == (3, 8)
    assert len(feats) == 6                      # encoder.py:28-44 at crop>=256
    # strided halving from the internal 256x256 resize
    assert feats[0].shape == (3, 128, 128, 2)
    assert feats[-1].shape == (3, 4, 4, 16)


def test_discriminator_shapes():
    disc = MultiscaleDiscriminator(ndf=2, n_layers=4, num_d=2)
    x = jnp.zeros((2, 80, 64, 5))
    vars_ = disc.init(jax.random.PRNGKey(0), x)
    out = disc.apply(vars_, x)
    assert len(out) == 2 and all(len(s) == 5 for s in out)
    # torch conv arithmetic: k4 s2 p2 -> n/2+1 (discriminator.py:87-99)
    # (verified vs reference at full res: 320x256 in -> 161x129 first layer)
    assert out[0][0].shape == (2, 41, 33, 2)
    assert out[0][-1].shape[-1] == 1
    # second scale sees the avg-pooled input
    assert out[1][0].shape[1] == 21


def test_param_counts_match_reference():
    """Reference (torch) param totals at the default full config, measured by
    instantiating the reference networks once: netG 92,460,481 /
    netE 6,529,632 / netD 5,531,778.  Identical kernel shapes -> exact match
    (counted via eval_shape, no compute)."""
    opt = Options(compute_dtype="float32").finalize()
    model = Pix2Pix(opt)
    variables = jax.eval_shape(lambda k: model.init_variables(k),
                               jax.random.PRNGKey(0))
    assert param_count(variables["G"]["params"]) == 92_460_481
    assert param_count(variables["E"]["params"]) == 6_529_632
    assert param_count(variables["D"]["params"]) == 5_531_778


def test_spectral_norm_power_iteration():
    """u updates during train forwards, stays put at eval; normalized kernel
    has spectral norm ~1 after convergence."""
    from seg2eye_tpu.models.layers import SpectralConv
    conv = SpectralConv(8, (3, 3))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    vars_ = conv.init(jax.random.PRNGKey(0), x)
    u0 = vars_["spectral"]["u"]
    state = vars_
    for _ in range(30):
        _, mut = conv.apply(state, x, update_stats=True, mutable=["spectral"])
        state = {**state, **mut}
    u = state["spectral"]["u"]
    assert not np.allclose(np.asarray(u0), np.asarray(u))
    # eval: no update
    _ = conv.apply(state, x, update_stats=False)
    k = np.asarray(vars_["params"]["kernel"]).reshape(-1, 8).T
    sigma = np.linalg.svd(k, compute_uv=False)[0]
    un, vn = np.asarray(u), None
    # sigma estimate from converged u should approximate the true sigma
    west = un @ k
    est = np.linalg.norm(west)
    np.testing.assert_allclose(est, sigma, rtol=1e-3)


def test_encode_w_vmap_equivalence():
    """Fused (B*k) encoding must equal per-sample looped encoding."""
    opt = small_opt()
    model = Pix2Pix(opt)
    variables = model.init_variables(jax.random.PRNGKey(0), with_disc=False)
    style = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 40, 32, 1))
    w, feats, _ = model.encode_w(variables, style, train=False)
    assert w.shape == (2, opt.w_dim)
    # loop per sample, aggregate manually
    mus = []
    for b in range(2):
        mu, _, _ = model.enc.apply(variables["E"], style[b])
        mus.append(jnp.mean(mu, axis=0))
    np.testing.assert_allclose(np.asarray(w), np.asarray(jnp.stack(mus)),
                               rtol=2e-5, atol=2e-5)


def test_discriminate_layouts_identical():
    """The interleaved ([f0,r0,f1,r1]) and concatenated ([fake|real]) 2B
    discriminator batches are bitwise-equivalent: per-sample ops are
    permutation-equivariant, and the multi-chip default (interleaved) must
    change nothing but the sharding-facing layout."""
    opt = small_opt()
    model = Pix2Pix(opt)
    variables = model.init_variables(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    seg = jax.nn.one_hot(rng.integers(0, 4, (2, 32, 32)), 4,
                         dtype=np.float32)
    fake = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 1)).astype(np.float32))
    real = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 1)).astype(np.float32))

    run = jax.jit(lambda il: model.discriminate(
        variables, jnp.asarray(seg), fake, real, train=True, interleave=il),
        static_argnums=0)
    pf_i, pr_i, nd_i = run(True)
    pf_c, pr_c, nd_c = run(False)
    for si in range(len(pf_i)):
        for li in range(len(pf_i[si])):
            np.testing.assert_array_equal(np.asarray(pf_i[si][li]),
                                          np.asarray(pf_c[si][li]))
            np.testing.assert_array_equal(np.asarray(pr_i[si][li]),
                                          np.asarray(pr_c[si][li]))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-7),
        nd_i, nd_c)
