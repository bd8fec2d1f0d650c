"""Fused SPADE+Style kernel: numerics vs the unfused reference math
(interpret mode on the CPU mesh; the same kernel compiles on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seg2eye_tpu.ops.pallas.spade_style import (fused_spade_style,
                                                pallas_eligible,
                                                spade_style_reference)


def make_inputs(n=2, h=16, w=32, c=8, s=4, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    r = lambda *sh: jnp.asarray(rng.normal(size=sh).astype(np.float32))
    x = r(n, h, w, c).astype(dtype)
    seg = jnp.asarray(
        jax.nn.one_hot(rng.integers(0, s, (n, h, w)), s, dtype=np.float32))
    style = r(n, 2 * c) * 0.1
    mean = jnp.broadcast_to(jnp.mean(x.astype(jnp.float32), axis=(0, 1, 2)),
                            (n, c))
    var = jnp.broadcast_to(jnp.var(x.astype(jnp.float32), axis=(0, 1, 2)),
                           (n, c))
    ws, bs = r(3, 3, s, 128) * 0.1, r(128) * 0.1
    wg, bg = r(3, 3, 128, c) * 0.1, r(c) * 0.1
    wb, bb = r(3, 3, 128, c) * 0.1, r(c) * 0.1
    return (x, seg, style, mean, var, ws, bs, wg, bg, wb, bb)


def test_kernel_matches_reference():
    args = make_inputs()
    ref = spade_style_reference(*args)
    got = fused_spade_style(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_kernel_odd_tiles():
    # H=10,W=8 exercises the small-divisor tiling path
    args = make_inputs(n=1, h=10, w=8, c=16)
    ref = spade_style_reference(*args)
    got = fused_spade_style(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_kernel_gradients_match_reference():
    args = make_inputs(n=1, h=8, w=8, c=8)

    def loss_fused(x, style, wg):
        a = list(args)
        a[0], a[2], a[7] = x, style, wg
        return jnp.sum(fused_spade_style(*a, interpret=True) ** 2)

    def loss_ref(x, style, wg):
        a = list(args)
        a[0], a[2], a[7] = x, style, wg
        return jnp.sum(spade_style_reference(*a) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(args[0], args[2], args[7])
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(args[0], args[2], args[7])
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_eligibility():
    # measured dispatch window (tools/bench_pallas.py, v5e): the kernel wins
    # only at the mid-resolution/high-channel generator sites
    assert pallas_eligible((16, 80, 64, 512))        # up_1 norm_0/norm_s
    assert pallas_eligible((16, 80, 64, 256))        # up_1 norm_1
    assert not pallas_eligible((1, 10, 8, 1024))     # tiny spatial, huge C
    assert not pallas_eligible((16, 320, 256, 64))   # XLA conv emitter wins
    assert not pallas_eligible((16, 160, 128, 128))  # ditto


def test_block_pallas_flag_same_params():
    """use_pallas=True/False share the identical parameter tree."""
    from seg2eye_tpu.models.normalization import SpadeStyleBlock
    x = jnp.zeros((1, 16, 16, 8))
    seg = jnp.zeros((1, 16, 16, 4))
    w = jnp.zeros((1, 8))
    v0 = SpadeStyleBlock(use_pallas=False).init(jax.random.PRNGKey(0), x,
                                                seg, w)
    v1 = SpadeStyleBlock(use_pallas=True).init(jax.random.PRNGKey(0), x,
                                               seg, w)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
