"""Persistent XLA compilation cache + platform selection (shared by
tests, CLI, bench)."""
from __future__ import annotations

import os


def select_platform() -> None:
    """Honor TCAM_TPU_PLATFORM / JAX_PLATFORMS via jax.config — the env
    var alone is unreliably honored once a PJRT plugin (axon) registers
    itself, but the config flag always wins if set before backend init."""
    want = (os.environ.get("TCAM_TPU_PLATFORM")
            or os.environ.get("JAX_PLATFORMS"))
    if want:
        import jax
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass  # backend already initialized; nothing to do


def enable_compilation_cache(path: str | None = None) -> None:
    select_platform()
    import jax
    cache = path or os.environ.get("TCAM_TPU_JAX_CACHE",
                                   "/tmp/jax_cache_tcam")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # config may be finalized in exotic embedders
        pass
