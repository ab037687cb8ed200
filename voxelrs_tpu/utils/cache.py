"""Persistent XLA compile cache — TPU compiles on this setup go through a
remote-compile tunnel and can take minutes; caching makes them one-time."""

import jax

_enabled = False


def enable_compile_cache(path: str = "/root/repo/.jax_cache") -> None:
    global _enabled
    if _enabled:
        return
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled = True
