"""The space-to-batch compile-crash workaround (utils/platform.py).

XLA's TPU space-to-batch converter SIGABRTs the compile service on
backprop-filter convs at small batch (space_to_batch_converter.cc:2011),
but the same pass is what makes small-batch *inference* fast (disabling it
globally measured 2x slower bs=1 RefineNet serving).  So the disable is
scoped: ``training_jit`` injects per-jit compiler options on training-step
programs only; eval/serving jits keep the pass.  Chip-validated in round 5
— see evidence/probe_512.json and the BASELINE.md round-5 close-out.
"""
import jax
import jax.numpy as jnp
import numpy as np

from seg2eye_tpu.utils import platform


def test_training_compiler_options_default(monkeypatch):
    monkeypatch.delenv("SEG2EYE_SPACE_TO_BATCH", raising=False)
    assert platform.training_compiler_options() == {
        "xla_disable_hlo_passes": "space-to-batch-converter"}


def test_training_compiler_options_opt_out(monkeypatch):
    monkeypatch.setenv("SEG2EYE_SPACE_TO_BATCH", "1")
    assert platform.training_compiler_options() == {}


def test_training_jit_runs_and_matches_plain_jit(monkeypatch):
    monkeypatch.delenv("SEG2EYE_SPACE_TO_BATCH", raising=False)
    f = platform.training_jit(lambda x: x * 2 + 1)
    x = jnp.arange(4.0)
    np.testing.assert_array_equal(np.asarray(f(x)),
                                  np.asarray(jax.jit(lambda x: x * 2 + 1)(x)))


def test_training_jit_passes_jit_kwargs(monkeypatch):
    monkeypatch.delenv("SEG2EYE_SPACE_TO_BATCH", raising=False)

    def g(state, y):
        return state + y, y

    f = platform.training_jit(g, donate_argnums=(0,))
    s, y = f(jnp.ones(3), jnp.ones(3))
    np.testing.assert_array_equal(np.asarray(s), 2 * np.ones(3))


def test_training_jit_respects_caller_compiler_options(monkeypatch):
    monkeypatch.delenv("SEG2EYE_SPACE_TO_BATCH", raising=False)
    f = platform.training_jit(lambda x: x + 1,
                              compiler_options={"xla_disable_hlo_passes":
                                                "foo-pass"})
    np.testing.assert_array_equal(np.asarray(f(jnp.zeros(2))), np.ones(2))


def test_step_functions_carry_options(monkeypatch):
    """StepFunctions exposes the options it compiled with, so bench's
    cost-analysis compile can reuse them (cache hit, no crash re-entry)."""
    monkeypatch.delenv("SEG2EYE_SPACE_TO_BATCH", raising=False)
    from seg2eye_tpu.models.pix2pix import Pix2Pix
    from seg2eye_tpu.options import Options
    from seg2eye_tpu.train.steps import StepFunctions

    opt = Options(ngf=4, ndf=4, crop_size=32, aspect_ratio=1.0, w_dim=8,
                  input_ns=2, batchSize=2, compute_dtype="float32").finalize()
    steps = StepFunctions(Pix2Pix(opt), donate=False)
    assert steps.compiler_options == platform.training_compiler_options()
