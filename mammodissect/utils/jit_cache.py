"""Persistent XLA compilation cache.

First compile of the 39-block B5 harvest program at 1520x912 costs ~11 minutes on this
TPU runtime; the persistent cache makes every later process start warm. Called by the
CLIs and bench.py; safe to call multiple times."""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "mammodissect", "xla")


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    import jax

    # CPU compiles are fast and AOT cache entries are machine-feature-pinned
    # (cross-machine loads warn about possible SIGILL) — never cache them. Two
    # independent signals, either one vetoes:
    #  * jax_platforms first entry: once a TPU backend is initialized,
    #    default_backend() keeps reporting it even after
    #    jax.config.update("jax_platforms", "cpu") while compiles actually go to
    #    CPU (observed: the multichip dryrun re-enabled the shared cache through
    #    the stale guard and loaded CPU AOT entries from other hosts);
    #  * default_backend(): this env pins jax_platforms="axon,cpu", and if the
    #    axon plugin fails to initialize (chip held elsewhere) JAX falls back to
    #    the cpu entry — the platform string alone would miss that.
    platform = (getattr(jax.config, "jax_platforms", None) or "").split(",")[0]
    if platform == "cpu" or jax.default_backend() == "cpu":
        return None
    cache_dir = cache_dir or os.environ.get("MAMMODISSECT_XLA_CACHE", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
