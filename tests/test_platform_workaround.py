"""The space-to-batch compile-crash workaround (utils/platform.py).

XLA's TPU space-to-batch converter SIGABRTs the compile service on
backprop-filter convs at small batch (space_to_batch_converter.cc:2011);
configure_from_env disables the pass via XLA_FLAGS before XLA's lazy flag
parse.  Chip-validated both ways (shell-env and in-process) in round 5 —
see evidence/probe_512.json and the BASELINE.md round-5 close-out.
"""
import os

from seg2eye_tpu.utils import platform


def test_appends_disable_flag(monkeypatch):
    monkeypatch.delenv("SEG2EYE_SPACE_TO_BATCH", raising=False)
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    platform._workaround_space_to_batch_crash()
    assert os.environ["XLA_FLAGS"] == (
        "--xla_force_host_platform_device_count=8 "
        "--xla_disable_hlo_passes=space-to-batch-converter")


def test_appends_when_unset(monkeypatch):
    monkeypatch.delenv("SEG2EYE_SPACE_TO_BATCH", raising=False)
    monkeypatch.delenv("XLA_FLAGS", raising=False)
    platform._workaround_space_to_batch_crash()
    assert os.environ["XLA_FLAGS"] == \
        "--xla_disable_hlo_passes=space-to-batch-converter"


def test_opt_out(monkeypatch):
    monkeypatch.setenv("SEG2EYE_SPACE_TO_BATCH", "1")
    monkeypatch.setenv("XLA_FLAGS", "")
    platform._workaround_space_to_batch_crash()
    assert os.environ["XLA_FLAGS"] == ""


def test_existing_disable_list_is_respected(monkeypatch):
    """A caller already managing --xla_disable_hlo_passes keeps full control
    (the flag is single-valued; appending a second copy would clobber)."""
    monkeypatch.delenv("SEG2EYE_SPACE_TO_BATCH", raising=False)
    monkeypatch.setenv("XLA_FLAGS", "--xla_disable_hlo_passes=foo-pass")
    platform._workaround_space_to_batch_crash()
    assert os.environ["XLA_FLAGS"] == "--xla_disable_hlo_passes=foo-pass"


def test_idempotent(monkeypatch):
    monkeypatch.delenv("SEG2EYE_SPACE_TO_BATCH", raising=False)
    monkeypatch.setenv("XLA_FLAGS", "")
    platform._workaround_space_to_batch_crash()
    once = os.environ["XLA_FLAGS"]
    platform._workaround_space_to_batch_crash()
    assert os.environ["XLA_FLAGS"] == once
