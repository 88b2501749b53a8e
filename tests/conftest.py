"""Test configuration: run on CPU with 8 virtual devices so pjit/shard_map
multi-chip paths are exercised without TPU hardware (the JAX-native pattern;
see SURVEY.md section 4 implication (c))."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
