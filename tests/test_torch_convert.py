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
