"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-native "multi-chip without a real cluster" mechanism
(SURVEY.md §4): correctness tests run in f64 on CPU, and the sharding tests
see 8 devices via --xla_force_host_platform_device_count.

Note: this environment pins JAX_PLATFORMS=axon (a tunneled real TPU) via a
sitecustomize hook, so the env var alone is not enough — we must override the
platform through jax.config after import.  Eager per-op dispatch to the
tunneled TPU is ~40ms/op, which would make the test suite unusably slow.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the 8-device shard_map programs in
# tests/test_parallel.py take ~30s each to compile cold; cached reruns
# roughly halve that file's runtime (tracing is not cached).  Same
# directory bench.py uses (gitignored).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import nllstpu  # noqa: E402,F401  (enables x64)

assert jax.default_backend() == "cpu"
