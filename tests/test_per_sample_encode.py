"""--per_sample_encode: reference-exact per-sample style encoding.

The reference encodes each sample's k style refs in its own netE forward
(pix2pix_model.py:285,299-303) — spectral u advances per sample, and a
batch-subnorm encoder normalizes each sample over its OWN k refs.  The
lax.scan path must match a hand-rolled per-sample Python loop; the torch
oracle lives in tools/check_reference_parity.py check_per_sample_encode.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seg2eye_tpu.models.pix2pix import MUTABLE, Pix2Pix
from seg2eye_tpu.options import Options


def make_model(norm_e="spectralinstance", **kw):
    kw.setdefault("per_sample_encode", "on")
    opt = Options(compute_dtype="float32", ngf=4, ndf=4, w_dim=8,
                  crop_size=32, aspect_ratio=1.0, label_nc=4,
                  norm_E=norm_e, isTrain=True, **kw).finalize()
    return Pix2Pix(opt)


def test_auto_resolution():
    base = dict(compute_dtype="float32", isTrain=True)
    assert not Options(**base).finalize().per_sample_encode_enabled
    assert Options(norm_E="spectralbatch",
                   **base).finalize().per_sample_encode_enabled
    assert Options(norm_E="batch", **base).finalize() \
        .per_sample_encode_enabled
    assert Options(per_sample_encode="on",
                   **base).finalize().per_sample_encode_enabled
    assert not Options(per_sample_encode="off", norm_E="spectralbatch",
                       **base).finalize().per_sample_encode_enabled
    with pytest.raises(ValueError):
        Options(per_sample_encode="yes", **base).finalize()


@pytest.mark.parametrize("norm_e", ["spectralinstance", "spectralbatch"])
def test_scan_matches_python_loop(norm_e):
    """Train-mode scan == per-sample loop: outputs AND threaded mutable
    state (spectral u/v advanced once per sample, BN stats B times)."""
    m = make_model(norm_e)
    v = m.init_variables(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B, K = 3, 2
    style = jnp.asarray(rng.uniform(-1, 1, (B, K, 64, 64, 1))
                        .astype(np.float32))
    w, feats, new_e = m.encode_w(v, style, train=True)

    evars = v["E"]
    mut = {c: evars[c] for c in MUTABLE if c in evars}
    static = {c: x for c, x in evars.items() if c not in mut}
    mus, fs = [], []
    for b in range(B):
        (mu, _lv, f), newm = m.enc.apply({**static, **mut}, style[b],
                                         update_stats=True, mutable=MUTABLE)
        mut = {c: newm.get(c, mut[c]) for c in mut}
        mus.append(np.mean(np.asarray(mu), axis=0))
        fs.append([np.mean(np.asarray(x), axis=0) for x in f])
    np.testing.assert_allclose(np.asarray(w), np.stack(mus),
                               rtol=2e-5, atol=1e-6)
    for i in range(len(fs[0])):
        # BN rescaling amplifies ulp-level differences between the scan-
        # compiled and standalone programs; the torch oracle is the arbiter
        np.testing.assert_allclose(np.asarray(feats[i]),
                                   np.stack([s[i] for s in fs]),
                                   rtol=2e-5, atol=5e-6)
    for c in mut:
        for (pa, va), (_, vb) in zip(
                jax.tree_util.tree_leaves_with_path(new_e[c]),
                jax.tree_util.tree_leaves_with_path(mut[c])):
            np.testing.assert_allclose(
                np.asarray(va), np.asarray(vb), rtol=2e-5, atol=1e-6,
                err_msg=f"{c}{jax.tree_util.keystr(pa)}")


def test_batch_subnorm_eval_per_sample_independence():
    """Eval (torch-train-mode batch stats): with per-sample encoding, a
    batch-subnorm encoder scores each sample with stats over its OWN refs —
    sample 0's w must not depend on its batch neighbors (the fused path
    shares one (B*k) statistic, where it does)."""
    m = make_model("spectralbatch")
    v = m.init_variables(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    s = rng.uniform(-1, 1, (3, 2, 64, 64, 1)).astype(np.float32)
    w_a, _, _ = m.encode_w(v, jnp.asarray(s[[0, 1]]), train=False)
    w_b, _, _ = m.encode_w(v, jnp.asarray(s[[0, 2]]), train=False)
    np.testing.assert_allclose(np.asarray(w_a)[0], np.asarray(w_b)[0],
                               rtol=1e-6, atol=1e-7)
    # the fused path genuinely couples neighbors (sanity of the test)
    m2 = make_model("spectralbatch", per_sample_encode="off")
    f_a, _, _ = m2.encode_w(v, jnp.asarray(s[[0, 1]]), train=False)
    f_b, _, _ = m2.encode_w(v, jnp.asarray(s[[0, 2]]), train=False)
    assert np.abs(np.asarray(f_a)[0] - np.asarray(f_b)[0]).max() > 1e-5


def test_generator_loss_trains_with_per_sample_encode():
    """Full G loss (incl. the per-sample style re-encode of the fake) runs
    and differentiates under the scan path."""
    m = make_model("spectralbatch", lambda_style_w=1.0, lambda_gram=1.0,
                   lambda_style_feat=1.0, lambda_l2=1.0)
    v = m.init_variables(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    B, K, H, W = 2, 2, 32, 32
    batch = {
        "label": jnp.asarray(rng.integers(0, 4, (B, H, W))),
        "style_image": jnp.asarray(
            rng.uniform(-1, 1, (B, K, H, W, 1)).astype(np.float32)),
        "target": jnp.asarray(
            rng.uniform(-1, 1, (B, H, W, 1)).astype(np.float32)),
    }

    def loss(p):
        vv = {n: {**v[n], "params": p[n]} for n in ("G", "E", "D")}
        total, (losses, _fake, _newv) = m.generator_loss(vv, batch)
        return total, losses

    (total, losses), grads = jax.jit(
        jax.value_and_grad(loss, has_aux=True))(
        {n: v[n]["params"] for n in ("G", "E", "D")})
    assert np.isfinite(float(total))
    assert all(np.isfinite(float(jnp.mean(x))) for x in losses.values())
    e_gmax = max(float(jnp.max(jnp.abs(g)))
                 for g in jax.tree_util.tree_leaves(grads["E"]))
    assert e_gmax > 0.0
