"""Test configuration: run on CPU with 8 virtual devices so pjit/shard_map
multi-chip paths are exercised without TPU hardware (the JAX-native pattern;
see SURVEY.md section 4 implication (c)).

NOTE: this environment pins JAX_PLATFORMS=axon (the real TPU tunnel), and the
env var alone does not override it — jax.config.update does. Tests force CPU
for determinism (f32 matmuls) and virtual multi-device meshes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: repeated suite runs skip recompiles
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass
