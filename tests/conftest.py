"""Test config: run everything on a virtual 8-device CPU mesh.

SURVEY.md §4: multi-device code is tested on CPU via
``xla_force_host_platform_device_count`` — the standard way to exercise mesh
code without TPU hardware. These env vars must be set before jax initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) pins jax_platforms via config, which
# overrides the env var — force CPU explicitly before any backend init.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite is compile-dominated (the full
# train/infer programs take 1-2 min EACH to compile on CPU; round-1 suite
# wall time was ~13 min, mostly recompiles of unchanged programs). With the
# cache, repeat runs skip every unchanged compile. Keyed on HLO + compiler
# version, so code changes invalidate exactly the affected programs.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
