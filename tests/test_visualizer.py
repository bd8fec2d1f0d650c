"""Visualizer panels and the SPADE+Style modulation block."""
import jax
import jax.numpy as jnp
import numpy as np

from seg2eye_tpu.models.normalization import SpadeStyleBlock
from seg2eye_tpu.ops.pallas.spade_style import spade_style_reference
from seg2eye_tpu.utils.visualizer import style_grid, visualize_sidebyside


def test_sidebyside_panel_shape():
    """Default panel geometry matches the reference error-log layout:
    5 panels x 200 wide + 60px footer -> (380, 1000) (tester.py:67-72)."""
    n, h, w = 2, 32, 32
    rng = np.random.default_rng(0)
    data = {
        "style_image": rng.uniform(-1, 1, (n, 4, h, w, 1)).astype(np.float32),
        "label": rng.integers(0, 4, (n, h, w)).astype(np.uint8),
        "target": rng.uniform(-1, 1, (n, h, w, 1)).astype(np.float32),
        "fake": rng.uniform(-1, 1, (n, h, w, 1)).astype(np.float32),
        "user": ["U001", "U002"],
        "filename": ["f1", "f2"],
    }
    vis = visualize_sidebyside(data, error_list=np.array([0.1, 0.2]))
    assert len(vis) == 2
    for panel in vis.values():
        assert panel.shape == (1, 380, 1000)
        assert panel.min() >= -1 and panel.max() <= 1


def test_sidebyside_uint8_transport_batches():
    """The loader's default uint8 transport feeds the same panels: range
    sniffing maps [0,255] uint8 and [-1,1] f32 to the same geometry."""
    n, h, w = 2, 32, 32
    rng = np.random.default_rng(0)
    data = {
        "style_image": rng.integers(0, 256, (n, 4, h, w, 1)).astype(np.uint8),
        "label": rng.integers(0, 4, (n, h, w)).astype(np.uint8),
        "target": rng.integers(0, 256, (n, h, w, 1)).astype(np.uint8),
        "fake": rng.uniform(-1, 1, (n, h, w, 1)).astype(np.float32),
        "user": ["U001", "U002"],
        "filename": ["f1", "f2"],
    }
    vis = visualize_sidebyside(data, error_list=np.array([0.1, 0.2]))
    assert len(vis) == 2
    for panel in vis.values():
        assert panel.shape == (1, 380, 1000)
        assert panel.min() >= -1 and panel.max() <= 1


def test_style_grid_pads_missing_refs():
    style = np.random.default_rng(0).uniform(-1, 1, (2, 16, 16, 1))
    grid = style_grid(style.astype(np.float32), w=64, h=64)
    assert grid.shape == (64, 64)


def test_spade_style_block_instance_norm_matches_reference_math():
    """SpadeStyleBlock's instance-norm path equals spade_style_reference
    applied to the block's own parameters — one implementation of the
    modulation math (reference normalization.py:172-192)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    seg = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))
    blk = SpadeStyleBlock(param_free="instance")
    variables = blk.init(jax.random.PRNGKey(1), x, seg, w)
    out = blk.apply(variables, x, seg, w)
    assert out.shape == x.shape

    p = variables["params"]
    style = jax.nn.leaky_relu(
        w @ p["adain_linear"]["weight"] + p["adain_linear"]["bias"], 0.2)
    mean = jnp.mean(x, axis=(1, 2))
    var = jnp.var(x, axis=(1, 2))
    want = spade_style_reference(
        x, seg, style, mean, var,
        p["spade_mlp_shared_kernel"], p["spade_mlp_shared_bias"],
        p["spade_mlp_gamma_kernel"], p["spade_mlp_gamma_bias"],
        p["spade_mlp_beta_kernel"], p["spade_mlp_beta_bias"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
