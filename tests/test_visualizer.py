"""Visualizer panels and the standalone Spade/ApplyStyle modules."""
import jax
import jax.numpy as jnp
import numpy as np

from seg2eye_tpu.models.normalization import ApplyStyle, Spade
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


def test_style_grid_pads_missing_refs():
    style = np.random.default_rng(0).uniform(-1, 1, (2, 16, 16, 1))
    grid = style_grid(style.astype(np.float32), w=64, h=64)
    assert grid.shape == (64, 64)


def test_standalone_spade_and_applystyle():
    """The individual Spade/AdaIN modules (exported API) still run."""
    x = jnp.zeros((1, 8, 8, 4))
    seg = jnp.zeros((1, 8, 8, 4))
    w = jnp.zeros((1, 8))
    sp = Spade(param_free="instance")
    v = sp.init(jax.random.PRNGKey(0), x, seg)
    out = sp.apply(v, x, seg)
    assert out.shape == x.shape
    ast = ApplyStyle()
    v2 = ast.init(jax.random.PRNGKey(0), x, w)
    out2 = ast.apply(v2, x, w)
    assert out2.shape == x.shape
