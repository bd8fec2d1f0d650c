"""VGG perceptual loss: torch forward parity + training integration
(SURVEY §7.3: the fork references VGGLoss at pix2pix_model.py:38 but never
ships the class; we implement it properly, default-off for parity)."""
import jax
import jax.numpy as jnp
import numpy as np

from seg2eye_tpu.models.vgg import VGG19Features, to_rgb
from seg2eye_tpu.ops import losses as L
from seg2eye_tpu.utils import torch_convert as tc

# torchvision vgg19.features layer list through relu5_1 (index 29)
_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
        512, 512, 512, 512, "M", 512]
_SLICE_ENDS = (1, 6, 11, 20, 29)


def _torch_vgg_slices(x_nchw):
    import torch
    import torch.nn as torch_nn
    torch.manual_seed(0)
    layers, in_ch = [], 3
    for v in _CFG:
        if v == "M":
            layers.append(torch_nn.MaxPool2d(2, 2))
        else:
            layers.append(torch_nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(torch_nn.ReLU(inplace=False))
            in_ch = v
    seq = torch_nn.Sequential(*layers)
    outs, h = [], torch.tensor(x_nchw)
    with torch.no_grad():
        for i, layer in enumerate(seq):
            h = layer(h)
            if i in _SLICE_ENDS:
                outs.append(h.numpy())
    return seq.state_dict(), outs


def test_vgg19_forward_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 3, 32, 48)).astype(np.float32)  # NCHW
    sd, torch_outs = _torch_vgg_slices(x)
    # bare-Sequential keys are '{i}.weight'; remap to torchvision's
    # 'features.{i}.weight' to exercise the primary converter path
    sd = {f"features.{k}": np.asarray(v) for k, v in sd.items()}

    net = VGG19Features()
    template = net.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 48, 3), jnp.float32))
    variables = tc.convert_vgg19(sd, jax.device_get(template))
    ours = jax.jit(net.apply)(variables,
                              jnp.asarray(np.moveaxis(x, 1, -1)))
    assert len(ours) == 5
    for i, (mine, ref) in enumerate(zip(ours, torch_outs)):
        np.testing.assert_allclose(np.moveaxis(np.asarray(mine), -1, 1),
                                   ref, rtol=1e-4, atol=1e-4,
                                   err_msg=f"slice {i}")


def test_vgg_loss_formula():
    rng = np.random.default_rng(1)
    fx = [jnp.asarray(rng.normal(size=(1, 4, 4, c)).astype(np.float32))
          for c in (8, 8, 8, 8, 8)]
    fy = [jnp.asarray(rng.normal(size=(1, 4, 4, c)).astype(np.float32))
          for c in (8, 8, 8, 8, 8)]
    want = sum(w * np.mean(np.abs(np.asarray(a) - np.asarray(b)))
               for w, a, b in zip(L.VGG_SLICE_WEIGHTS, fx, fy))
    assert np.isclose(float(L.vgg_loss(fx, fy)), want, rtol=1e-6)


def test_to_rgb_shapes():
    assert to_rgb(jnp.zeros((2, 8, 8))).shape == (2, 8, 8, 3)
    assert to_rgb(jnp.zeros((2, 8, 8, 1))).shape == (2, 8, 8, 3)


def test_train_step_with_vgg_loss(tmp_path):
    """--no_vgg_loss=False adds the frozen-VGG perceptual term to the fused
    G step; VGG params are excluded from both optimizers and checkpoints."""
    from test_train import tiny_batch, tiny_opt
    from seg2eye_tpu.models.pix2pix import Pix2Pix
    from seg2eye_tpu.train import state as state_lib
    from seg2eye_tpu.train.steps import StepFunctions
    from seg2eye_tpu.utils import checkpoint

    opt = tiny_opt(tmp_path, no_vgg_loss=False, lambda_vgg=10.0)
    model = Pix2Pix(opt)
    state = state_lib.create_state(model, jax.random.PRNGKey(0))
    assert "VGG" in state.variables
    vgg_before = jax.device_get(state.variables["VGG"])
    steps = StepFunctions(model, donate=False)
    new_state, losses, fake = steps.train_step(state, tiny_batch())
    assert "VGG/weighted" in losses and "VGG/raw" in losses
    assert np.isfinite(float(jnp.mean(losses["VGG/weighted"])))
    # frozen: the perceptual net must not train
    for a, b in zip(jax.tree_util.tree_leaves(vgg_before),
                    jax.tree_util.tree_leaves(
                        jax.device_get(new_state.variables["VGG"]))):
        np.testing.assert_array_equal(a, b)
    # and must not leak into checkpoints (frozen pretrained, reloaded via
    # --vgg_weights at startup)
    checkpoint.save_state(new_state, opt, "latest")
    import os
    assert not os.path.exists(os.path.join(opt.expr_dir,
                                           "latest_net_VGG.ckpt"))


def test_vgg_enabled_without_weights_errors(tmp_path):
    from test_train import tiny_opt
    from seg2eye_tpu.utils.checkpoint import load_vgg
    import pytest
    opt = tiny_opt(tmp_path, no_vgg_loss=False)
    with pytest.raises(ValueError, match="vgg_weights"):
        load_vgg({"VGG": {}}, opt)
