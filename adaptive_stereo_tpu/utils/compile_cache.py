"""Persistent XLA compilation cache control.

On the remote-dispatch TPU backend a cold compile of the fused adaptation
step costs minutes (PERFORMANCE.md "Compile latency"); the persistent cache
serializes compiled executables to disk so every later PROCESS pays a disk
read instead. Measured through the axon PJRT tunnel (round 3): a cached
entry loads in ~10 ms vs the original multi-second compile — the cache does
serialize through the remote backend.

Call enable_persistent_cache() before the first jit dispatch (it is a no-op
after tracing starts picking up compilations only for later programs).
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.environ.get(
    "ADAPTIVE_STEREO_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"),
)


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Enable the JAX persistent compilation cache at `cache_dir` (default:
    <repo>/.jax_cache, overridable via $ADAPTIVE_STEREO_COMPILE_CACHE).
    Returns the cache directory used."""
    import jax

    path = cache_dir or DEFAULT_CACHE_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything: on the remote backend even "fast" compiles carry
    # multi-second dispatch/serialization overhead worth skipping.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
