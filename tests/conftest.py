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
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
