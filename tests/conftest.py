"""Test env: force CPU backend with 8 virtual devices (multi-chip sharding tests
run on a virtual mesh, per the driver contract; real-TPU paths are exercised by
bench.py / __graft_entry__.py instead)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: the host env pins JAX_PLATFORMS=axon (TPU tunnel)
# XLA compiles here are slow (~0.5s per distinct op); persistent cache makes
# repeat test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.3")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# 8 virtual device threads share ONE core here: heavy per-device programs can
# take minutes to all reach a collective, and XLA:CPU's rendezvous aborts the
# process (SIGABRT "Termination timeout for all gather") after ~40s by default
if "collective_call_terminate" not in flags:
    flags += (" --xla_cpu_collective_timeout_seconds=3600"
              " --xla_cpu_collective_call_terminate_timeout_seconds=3600")
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Belt-and-braces: if a pytest entry-point plugin imported jax before this
# conftest ran (jaxtyping does; see pytest.ini addopts), env vars alone are too
# late — push the settings through jax.config, which works post-import as long
# as no backend has been created yet.
import sys

if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
