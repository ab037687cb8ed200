"""Test configuration: force a local 8-device virtual CPU mesh.

The container's sitecustomize imports jax and registers the remote axon TPU
backend at interpreter startup (every op round-trips a network tunnel —
pathologically slow for tests). jax is already imported by the time this
runs, but no backend is initialized yet, so the config override still wins.
"""

import os

import jax

# deterministic fused-path behavior in tests: compile on the calling
# thread (the async background compiler is a production/streaming feature;
# see ops/shading._async_compile_on)
os.environ.setdefault("VOXELRS_ASYNC_COMPILE", "0")

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

# The traversal while_loop is slow to compile; cache across pytest runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
