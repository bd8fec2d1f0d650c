"""AOT serving export: artifact roundtrip, batch polymorphism, parity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seg2eye_tpu.models.pix2pix import Pix2Pix
from seg2eye_tpu.options import Options
from seg2eye_tpu.ops.image import to_255resized
from seg2eye_tpu.serving import export_inference, load_serving


def small_opt(**kw):
    base = dict(ngf=4, ndf=4, crop_size=32, aspect_ratio=1.0, batchSize=2,
                input_ns=2, w_dim=8, compute_dtype="float32", isTrain=False)
    base.update(kw)
    return Options(**base).finalize()


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    opt = small_opt()
    model = Pix2Pix(opt)
    variables = model.init_variables(jax.random.PRNGKey(0))
    out = str(tmp_path_factory.mktemp("serving") / "artifact")
    # native_hw is (H, W) — the tester/_native_hw convention
    export_inference(model, variables, out, native_hw=(64, 40),
                     platforms=("cpu",))
    return out, model, variables, opt


def _batch(opt, bs, seed=0):
    rng = np.random.default_rng(seed)
    h, w = opt.image_height, opt.image_width
    label = rng.integers(0, opt.semantic_nc, (bs, h, w)).astype(np.uint8)
    style = rng.integers(0, 256, (bs, opt.input_ns, h, w, 1)).astype(np.uint8)
    return label, style


def test_roundtrip_matches_model(artifact):
    """Loaded artifact == live model.inference + score epilogue.

    Not bitwise: the artifact is a batch-polymorphic program (symbolic b),
    so XLA specializes reductions/fusions differently than the concrete-
    shape jit — measured drift ~3e-7 on [-1,1] outputs, which can flip a
    truncated integer by at most 1 at exact integer boundaries."""
    art_dir, model, variables, opt = artifact
    served = load_serving(art_dir)
    label, style = _batch(opt, 2)
    fake_s, f255_s = served(label, style)

    batch = {"label": jnp.asarray(label), "style_image": jnp.asarray(style)}
    fake = model.inference(variables, batch)
    f255 = to_255resized(fake, w=40, h=64)
    np.testing.assert_allclose(fake_s, np.asarray(fake), atol=1e-5)
    assert np.abs(f255_s - np.asarray(f255)).max() <= 1
    assert f255_s.shape == (2, 64, 40, 1)
    # integer-valued f32 (jnp.trunc keeps float — matches ops.image.to_255)
    assert f255_s.dtype == np.float32
    np.testing.assert_array_equal(f255_s, np.trunc(f255_s))
    assert f255_s.min() >= 0 and f255_s.max() <= 255


def test_batch_polymorphism(artifact):
    """One artifact serves multiple batch sizes (symbolic batch dim)."""
    art_dir, model, variables, opt = artifact
    served = load_serving(art_dir)
    for bs in (1, 5):
        label, style = _batch(opt, bs, seed=bs)
        fake_s, f255_s = served(label, style)
        batch = {"label": jnp.asarray(label),
                 "style_image": jnp.asarray(style)}
        np.testing.assert_allclose(
            fake_s, np.asarray(model.inference(variables, batch)), atol=1e-5)
        assert f255_s.shape == (bs, 64, 40, 1)


def test_meta_spec(artifact):
    art_dir, _, _, opt = artifact
    served = load_serving(art_dir)
    meta = served.meta
    assert meta["inputs"]["label"]["dtype"] == "uint8"
    assert meta["baked_options"]["w_dim"] == opt.w_dim
    assert meta["native_hw"] == [64, 40]


def test_no_model_code_needed(artifact, tmp_path):
    """The artifact runs through jax.export deserialize alone — the loader
    path touches no flax module or Options (the ServingModel class reads
    only program + weights + meta)."""
    art_dir, _, variables, opt = artifact
    from jax import export as jexport
    import flax.serialization
    import os
    with open(os.path.join(art_dir, "program.jaxexport"), "rb") as f:
        exported = jexport.deserialize(f.read())
    with open(os.path.join(art_dir, "variables.msgpack"), "rb") as f:
        v = flax.serialization.msgpack_restore(f.read())
    label, style = _batch(opt, 3, seed=9)
    fake, f255 = jax.jit(exported.call)(v, label, style)
    assert fake.shape == (3, 32, 32, 1)


def test_running_stats_bundle_is_batch_composition_invariant(tmp_path):
    """The promoted serving default (running statistics,
    tools/export_serving.py --stats running) makes sample i's output
    independent of its batch neighbors; the reference-parity batch-stats
    program does not (SPADE BNs normalize over the serving batch — the
    reference Tester never calls .eval()).  Both bundles are exported from
    the SAME weights; only the baked statistics mode differs."""
    variables = None
    bundles = {}
    for stats in ("running", "batch"):
        opt = small_opt(eval_use_running_stats=(stats == "running"))
        model = Pix2Pix(opt)
        if variables is None:
            variables = model.init_variables(jax.random.PRNGKey(0))
        out = str(tmp_path / f"art_{stats}")
        export_inference(model, variables, out, native_hw=(64, 40),
                         platforms=("cpu",))
        served = load_serving(out)
        assert served.meta["baked_options"]["eval_use_running_stats"] == \
            (stats == "running")
        bundles[stats] = served

    opt = small_opt()
    label, style = _batch(opt, 3, seed=7)
    for stats, served in bundles.items():
        full, _ = served(label, style)
        solo0, _ = served(label[:1], style[:1])
        row_drift = np.abs(full[0] - solo0[0]).max()
        if stats == "running":
            assert row_drift < 1e-5, row_drift
        else:
            # batch statistics: changing the batch changes the output
            assert row_drift > 1e-3, row_drift
    # different statistics -> different programs (not a silent no-op)
    f_run, _ = bundles["running"](label, style)
    f_bat, _ = bundles["batch"](label, style)
    assert np.abs(f_run - f_bat).max() > 1e-3


def test_default_native_orientation(tmp_path):
    """The default export bakes the OpenEDS native eval size in the SAME
    orientation the Tester scores at: H=640, W=400 (eval/tester.py
    _native_hw, ops/image.py to_255resized defaults) — regression for a
    (w,h) unpack that transposed the default fake_255 output."""
    opt = small_opt()
    model = Pix2Pix(opt)
    variables = model.init_variables(jax.random.PRNGKey(0))
    exported = export_inference(model, variables, str(tmp_path / "art"),
                                platforms=("cpu",))
    assert tuple(exported.out_avals[1].shape[1:]) == (640, 400, 1)


# --------------------------------------------------------------------- #
# RefineNet / SegNet serving artifacts (serving.export_refiner)
# --------------------------------------------------------------------- #
def _tiny_cfg():
    from seg2eye_tpu.refinenet.config import RefineNetConfig
    return RefineNetConfig(compute_dtype="float32", resnet_depth=14,
                           input_width=40, input_height=64)


def test_refinenet_export_roundtrip(tmp_path):
    """RefineNet artifact == live forward (eval mode), incl. the exact
    submission uint8 conversion of refinenet/evaluate_refinenet.py
    (reference :104-112); batch-polymorphic."""
    from seg2eye_tpu.refinenet.model import RefineNetModel
    from seg2eye_tpu.serving import export_refiner

    cfg = _tiny_cfg()
    model = RefineNetModel(cfg)
    variables = model.init(jax.random.PRNGKey(0))
    out = str(tmp_path / "art")
    export_refiner(model, jax.device_get(variables), out, platforms=("cpu",))
    served = load_serving(out)
    assert served.meta["model_type"] == "refinenet"
    assert served.meta["baked_config"]["resnet_depth"] == 14

    rng = np.random.default_rng(0)
    for bs in (1, 3):
        x = rng.integers(0, 256, (bs, 64, 40, 3)).astype(np.uint8)
        pred_s, pred_u8_s = served(x)
        live, _ = model.forward(variables, {"input": x}, train=False)
        live_pred = np.asarray(live["prediction"], np.float32)
        np.testing.assert_allclose(pred_s, live_pred, atol=1e-5)
        live_u8 = np.clip((live_pred + 1.0) * 255.0 / 2.0,
                          0, 255).astype(np.uint8)[..., 0]
        assert pred_u8_s.dtype == np.uint8
        assert pred_u8_s.shape == (bs, 64, 40)
        # polymorphic-program drift can flip a truncated integer by 1
        assert np.abs(pred_u8_s.astype(np.int32)
                      - live_u8.astype(np.int32)).max() <= 1


def test_segnet_export_roundtrip(tmp_path):
    """SegNet artifact emits the identical argmax class map as the live
    model (uint8, one byte/pixel off the device)."""
    from seg2eye_tpu.refinenet.model import SegNetModel
    from seg2eye_tpu.serving import export_refiner

    cfg = _tiny_cfg()
    model = SegNetModel(cfg)
    variables = model.init(jax.random.PRNGKey(1))
    out = str(tmp_path / "art")
    export_refiner(model, jax.device_get(variables), out, platforms=("cpu",))
    served = load_serving(out)
    assert served.meta["model_type"] == "segnet"

    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, (2, 64, 40, 1)).astype(np.uint8)
    pred_s = served(x)
    live, _ = model.forward(variables, {"input": x}, train=False)
    live_pred = np.asarray(live["prediction"]).astype(np.uint8)
    assert pred_s.dtype == np.uint8 and pred_s.shape == (2, 64, 40)
    # argmax over float logits: polymorphic-program drift can only flip a
    # class at an exact logit tie, which random weights make measure-zero
    np.testing.assert_array_equal(pred_s, live_pred)
