"""Architecture/loss variants: more/most generator ladders, num_D/n_layers_D,
all optional loss terms in one training step."""
import jax
import jax.numpy as jnp
import numpy as np

from seg2eye_tpu.models.discriminator import MultiscaleDiscriminator
from seg2eye_tpu.models.generator import SpadeStyleGenerator
from seg2eye_tpu.models.pix2pix import Pix2Pix
from seg2eye_tpu.options import Options
from seg2eye_tpu.train import state as state_lib
from seg2eye_tpu.train.steps import StepFunctions


def test_generator_more_and_most():
    # crop 64 / aspect 1.0: normal sw=2, more sw=1, most sw=0 -> use crop 128
    for variant, sh in (("more", 2), ("most", 1)):
        gen = SpadeStyleGenerator(ngf=4, crop_size=128, aspect_ratio=1.0,
                                  num_upsampling_layers=variant)
        assert gen.latent_size() == (sh, sh)
        seg = jnp.zeros((1, 128, 128, 4))
        w = jnp.zeros((1, 16))
        v = gen.init(jax.random.PRNGKey(0), seg, w)
        out, _ = gen.apply(v, seg, w, mutable=["batch_stats"])
        assert out.shape == (1, 128, 128, 1), variant
        if variant == "most":
            assert "up_4" in v["params"]


def test_num_d_three_scales():
    disc = MultiscaleDiscriminator(ndf=2, n_layers=3, num_d=3)
    x = jnp.zeros((1, 64, 64, 5))
    v = disc.init(jax.random.PRNGKey(0), x)
    out = disc.apply(v, x)
    assert len(out) == 3 and all(len(s) == 4 for s in out)


def test_all_loss_terms_one_step():
    """lambda_{l1,l2,openeds,style_w,style_feat,gram} all active: the full
    style-consistency path (incl. encoding the fake) trains one step."""
    opt = Options(ngf=4, ndf=4, crop_size=32, aspect_ratio=1.0, w_dim=8,
                  input_ns=2, batchSize=2, compute_dtype="float32",
                  isTrain=True, lambda_l1=1.0, lambda_l2=1.0,
                  lambda_openeds=0.001, lambda_style_w=1.0,
                  lambda_style_feat=0.01, lambda_gram=100.0).finalize()
    model = Pix2Pix(opt)
    state = state_lib.create_state(model, jax.random.PRNGKey(0))
    steps = StepFunctions(model, donate=False)
    rng = np.random.default_rng(0)
    batch = {
        "label": jnp.asarray(rng.integers(0, 4, (2, 32, 32))),
        "style_image": jnp.asarray(
            rng.uniform(-1, 1, (2, 2, 32, 32, 1)).astype(np.float32)),
        "target": jnp.asarray(
            rng.uniform(-1, 1, (2, 32, 32, 1)).astype(np.float32)),
    }
    state, losses, fake = steps.train_step(state, batch)
    for key in ("GAN", "GAN_Feat", "L1/weighted", "L2/weighted",
                "openeds/weighted", "style_w/weighted",
                "style_feat/weighted", "gram/weighted",
                "L1/raw", "style_w/raw", "D/Fake", "D/real"):
        assert key in losses, key
        assert np.isfinite(float(jnp.mean(losses[key]))), key


def test_no_ganfeat_variant():
    opt = Options(ngf=4, ndf=4, crop_size=32, aspect_ratio=1.0, w_dim=8,
                  input_ns=2, batchSize=2, compute_dtype="float32",
                  isTrain=True, no_ganFeat_loss=True).finalize()
    model = Pix2Pix(opt)
    state = state_lib.create_state(model, jax.random.PRNGKey(0))
    steps = StepFunctions(model, donate=False)
    rng = np.random.default_rng(1)
    batch = {
        "label": jnp.asarray(rng.integers(0, 4, (2, 32, 32))),
        "style_image": jnp.asarray(
            rng.uniform(-1, 1, (2, 2, 32, 32, 1)).astype(np.float32)),
        "target": jnp.asarray(
            rng.uniform(-1, 1, (2, 32, 32, 1)).astype(np.float32)),
    }
    _, losses, _ = steps.train_step(state, batch)
    assert "GAN_Feat" not in losses
