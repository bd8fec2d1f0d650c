import os

# Run all tests on a virtual 8-device CPU mesh (SURVEY.md §4d): the TPU
# analogue of "test multi-node without a cluster".
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

# Single-core CPU XLA compiles are slow (~5-10s per distinct conv shape);
# a persistent compilation cache makes repeat test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# pytest plugins (flax/chex) import jax BEFORE this conftest, so the env vars
# above may be too late for them — force the config directly; backends
# initialize lazily so this still wins as long as no device was touched.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()


def pytest_sessionfinish(session, exitstatus):
    """Record the FULL-suite test count so the doc-stated counts are checked
    against a measured artifact (tests/test_docs.py), not hand-synced.
    Only written for unfiltered green runs over the whole tests/ dir."""
    cfg = session.config
    if (exitstatus == 0 and not cfg.getoption("keyword")
            and not cfg.getoption("markexpr") and session.items):
        import pathlib
        here = pathlib.Path(__file__).resolve().parent
        args = [a.split("::")[0] for a in cfg.invocation_params.args
                if not a.startswith("-")]
        full = all(pathlib.Path(a).resolve() in (here, here.parent)
                   for a in args) if args else True
        if full:
            import json
            (here.parent / "evidence" / "test_count.json").write_text(
                json.dumps({"collected": len(session.items)}) + "\n")
