"""Shared runtime utilities."""

from __future__ import annotations

import os


def maybe_enable_compile_cache() -> str:
    """Persistent XLA compilation cache, ON by default at <repo>/.jax_cache
    (UFVIDEO_JAX_CACHE=off disables, =<dir> relocates). Verified on the
    axon TPU (PERF.md round 4: decode bench 821 s cold → 350 s warm);
    remote compiles cost 3-25 min per jit variant, so every entry point
    (bench, train, eval, serve, loadtest) calls this at startup. Returns
    the cache dir ('' when disabled)."""
    cache_dir = os.environ.get("UFVIDEO_JAX_CACHE", "")
    if cache_dir.lower() == "off":
        return ""
    if not cache_dir:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)
            ))),
            ".jax_cache",
        )
        os.environ["UFVIDEO_JAX_CACHE"] = cache_dir  # subprocesses inherit
    import jax

    if jax.default_backend() != "tpu":
        # the CPU backend's cache path segfaulted mid-suite (conftest note,
        # 2026-08-18); only the remote-TPU compiles are worth caching anyway
        return ""
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    return cache_dir
