"""Test env: force CPU backend with 8 virtual devices (multi-chip sharding tests
run on a virtual mesh, per the driver contract; real-TPU paths are exercised by
bench.py / __graft_entry__.py instead)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
