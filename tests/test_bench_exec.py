"""Execution-level tests for the driver bench surface (bench.py).

Round-2 postmortem: a function-local ``import jax.extend.backend`` inside
``measure()``'s except handler made ``jax`` a local of the whole function,
so every ``jax.`` reference there raised UnboundLocalError — and the
AST-only contract test (test_graft_surface.py) could not catch it because
it never *ran* the code.  These tests actually execute ``measure()`` and
``main()`` with a stubbed ``_setup`` (no chip needed), including the
retry-after-backend-reset path, so that class of regression fails the
suite instead of the end-of-round driver run.
"""
import json

import numpy as np

import bench


class _StubSteps:
    """Quacks like train.steps.StepFunctions for the timing loop.

    ``train_step`` is a bound method with no ``.lower`` attribute, so the
    best-effort cost-analysis block in measure() exercises its except path.
    """

    def __init__(self):
        self.calls = 0

    def train_step(self, state, batch):
        self.calls += 1
        return state, {"GAN": np.float32(0.5)}, None


def _stub_setup(bs, reuse_fake, crop_size=256, remat=False):
    return object(), _StubSteps(), {"target": np.zeros((bs, 4, 4, 1),
                                                       np.uint8)}


def test_measure_has_no_local_jax():
    """The exact round-2 bug class: any import/assignment binding ``jax``
    inside measure() shadows the module-level name for the whole function."""
    assert "jax" not in bench.measure.__code__.co_varnames
    assert "jax" not in bench.main.__code__.co_varnames
    assert "jax" not in bench._setup.__code__.co_varnames


def test_measure_executes_end_to_end(monkeypatch):
    monkeypatch.setattr(bench, "_setup", _stub_setup)
    res = bench.measure([16, 8], steps_n=3, reuse_fake=True)
    assert res["bs"] == 16
    assert res["img_s"] > 0 and res["step_s"] > 0
    assert res["flops_per_step"] == 0.0  # stub has no .lower — except path
    assert "mfu" in res


def test_main_emits_exactly_one_contract_json_line(monkeypatch, capsys):
    """The driver contract (CLAUDE.md): ``python bench.py`` prints ONE JSON
    line with metric/value/unit/vs_baseline.  Runs main() for real."""
    monkeypatch.setenv("BENCH_STEPS", "2")
    monkeypatch.setenv("BENCH_BS", "4")
    monkeypatch.setattr(bench, "_setup", _stub_setup)
    bench.main()
    out_lines = capsys.readouterr().out.strip().splitlines()
    assert len(out_lines) == 1, out_lines
    rec = json.loads(out_lines[0])
    assert {"metric", "value", "unit", "vs_baseline"} <= rec.keys()
    assert rec["metric"] == "train_images_per_sec_chip"
    assert rec["value"] > 0
    assert rec["batch_size"] == 4
    assert rec["ref_semantics_images_per_sec"] > 0
    # the historical size-512 row rides along (best-effort, round-5)
    assert rec["size512_batch_size"] == 4
    assert rec["size512_images_per_sec"] > 0


def test_measure_retry_path_survives_setup_failure(monkeypatch):
    """Force one transient _setup failure: the backend-reset + retry path
    (which round 2 shipped broken and never executed) must run and recover
    at the SAME batch size."""
    import jax
    import jax.extend.backend

    monkeypatch.setenv("BENCH_RETRY_SLEEP_S", "0")
    calls = {"setup": 0, "cleared": 0, "reset": 0}

    def flaky_setup(bs, reuse_fake, crop_size=256, remat=False):
        calls["setup"] += 1
        if calls["setup"] == 1:
            raise RuntimeError("injected transient device wedge")
        return _stub_setup(bs, reuse_fake)

    monkeypatch.setattr(bench, "_setup", flaky_setup)
    # stub the real resets: clearing the live CPU backend mid-suite would
    # invalidate other tests' cached executables
    monkeypatch.setattr(
        jax, "clear_caches",
        lambda: calls.__setitem__("cleared", calls["cleared"] + 1))
    monkeypatch.setattr(
        jax.extend.backend, "clear_backends",
        lambda: calls.__setitem__("reset", calls["reset"] + 1))
    res = bench.measure([16, 8], steps_n=2, reuse_fake=False)
    assert calls["setup"] == 2              # failed once, retried once
    assert calls["cleared"] == 1 and calls["reset"] == 1
    assert res["bs"] == 16                  # headline bs preserved, not 8


def test_measure_degrades_bs_on_persistent_failure(monkeypatch):
    """If the preferred bs keeps failing after retries, measure() must fall
    back to the next candidate rather than crash."""
    import jax
    import jax.extend.backend

    monkeypatch.setenv("BENCH_RETRY_SLEEP_S", "0")

    def oom_at_16(bs, reuse_fake, crop_size=256, remat=False):
        if bs == 16:
            raise RuntimeError("RESOURCE_EXHAUSTED: injected OOM")
        return _stub_setup(bs, reuse_fake)

    monkeypatch.setattr(bench, "_setup", oom_at_16)
    monkeypatch.setattr(jax, "clear_caches", lambda: None)
    monkeypatch.setattr(jax.extend.backend, "clear_backends", lambda: None)
    res = bench.measure([16, 8], steps_n=2, reuse_fake=False)
    assert res["bs"] == 8
