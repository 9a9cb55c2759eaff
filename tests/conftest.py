"""Test harness config: run everything on a virtual 8-device CPU mesh so
CI needs no TPU (SURVEY.md §4 multi-chip strategy). Must run before any
jax import in test modules."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: amortize XLA compile time across test runs
# (each distinct program costs ~0.4s to compile on a small CI host).
import jax  # noqa: E402

# jax 0.9: the env var JAX_PLATFORMS=cpu suppresses jax_num_cpu_devices;
# the config knobs compose correctly (verified: env->1 device, config->8).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
