"""TorchBatchNorm (models/layers.py): exact torch.nn.BatchNorm2d train
semantics — two-pass variance + Bessel-corrected running_var update.

The RefineNet torch oracle (tools/check_reference_parity.py
check_refinenet_wrapper) exposed both flax-vs-torch BN differences on the
DeepLab stacks; this pins the single-layer contract so a refactor back to
flax nn.BatchNorm defaults fails loudly.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seg2eye_tpu.models.layers import TorchBatchNorm

torch = pytest.importorskip("torch")


def _pair(n_spatial=4, feat=5, mean=1.5):
    """Matched torch module + our variables on a shared input whose nonzero
    mean exercises the fast-variance cancellation the module avoids."""
    torch.manual_seed(0)
    bn_t = torch.nn.BatchNorm2d(feat, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        bn_t.weight.normal_(1, 0.2)
        bn_t.bias.normal_(0, 0.2)
    x = np.random.default_rng(0).normal(
        mean, 0.3, (2, n_spatial, n_spatial, feat)).astype(np.float32)
    m = TorchBatchNorm(use_running_average=False)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    v = {"params": {"scale": jnp.asarray(bn_t.weight.detach().numpy()),
                    "bias": jnp.asarray(bn_t.bias.detach().numpy())},
         "batch_stats": v["batch_stats"]}
    return bn_t, m, v, x


def test_train_forward_and_running_stats_match_torch():
    bn_t, m, v, x = _pair()
    bn_t.train()
    with torch.no_grad():
        yt = bn_t(torch.from_numpy(
            np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))).numpy()
    yj, mut = m.apply(v, jnp.asarray(x), mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yj),
                               np.transpose(yt, (0, 2, 3, 1)), atol=2e-6)
    # running stats: torch blends the UNBIASED (n/(n-1)) batch variance
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]),
                               bn_t.running_mean.numpy(), atol=1e-7)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]),
                               bn_t.running_var.numpy(), atol=1e-7)


def test_bessel_correction_present():
    """At n=32 the biased/unbiased running-var blends differ by 3% of the
    update — the flax default would fail this."""
    bn_t, m, v, x = _pair()
    _, mut = m.apply(v, jnp.asarray(x), mutable=["batch_stats"])
    n = x.size // x.shape[-1]
    xf = x.reshape(-1, x.shape[-1])
    biased = ((xf - xf.mean(0)) ** 2).mean(0)
    expected = 0.9 * 1.0 + 0.1 * biased * n / (n - 1)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]),
                               expected, rtol=1e-6)


def test_eval_uses_running_stats():
    bn_t, m, v, x = _pair()
    bn_t.eval()
    with torch.no_grad():
        yt = bn_t(torch.from_numpy(
            np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))).numpy()
    m_eval = TorchBatchNorm(use_running_average=True)
    yj = m_eval.apply(v, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(yj),
                               np.transpose(yt, (0, 2, 3, 1)), atol=2e-6)


def test_subnorm_batch_delegates_to_torch_batchnorm():
    """SubNorm's 'batch' path (the reference-legal spectralbatch norm_D/E
    variants, normalization.py:15-47 get_nonspade_norm_layer) must share
    TorchBatchNorm's torch-exact semantics — review finding round 4: it
    previously built flax nn.BatchNorm with one-pass variance and a biased
    running-var update.  Checks the delegation and the Bessel-corrected
    running update, and that init keeps the N(1, gain) BN weight."""
    from seg2eye_tpu.models.layers import SubNorm

    rng = np.random.default_rng(5)
    x = rng.uniform(0, 1, (2, 4, 4, 3)).astype(np.float32)
    sn = SubNorm(sub="batch")
    v = sn.init(jax.random.PRNGKey(3), jnp.asarray(x))
    assert "TorchBatchNorm_0" in v["params"]
    scale = np.asarray(v["params"]["TorchBatchNorm_0"]["scale"])
    assert not np.allclose(scale, 1.0)           # N(1, 0.02) init, not ones
    assert np.allclose(scale, 1.0, atol=0.2)

    _, mut = sn.apply(v, jnp.asarray(x), mutable=["batch_stats"])
    n = x.size // x.shape[-1]
    xf = x.reshape(-1, x.shape[-1])
    biased = ((xf - xf.mean(0)) ** 2).mean(0)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["TorchBatchNorm_0"]["var"]),
        0.9 * 1.0 + 0.1 * biased * n / (n - 1), rtol=1e-6)
