"""Shared CPU-feature-fingerprinted XLA compile cache dir for the test suite and
its real-multihost worker subprocesses ($HOME can outlive a driver host; loading
a foreign host's CPU AOT executables risks SIGILL and numeric drift)."""
import hashlib
import os


def test_cache_dir() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            flags = next(l for l in f if l.startswith("flags"))
    except (OSError, StopIteration):
        import platform

        flags = platform.processor() or "unknown"
    fp = hashlib.sha1(flags.encode()).hexdigest()[:10]
    return os.path.join(os.path.expanduser("~"), ".cache", "mammodissect",
                        f"xla-tests-{fp}")


def enable(jax) -> None:
    cache = test_cache_dir()
    os.makedirs(cache, exist_ok=True)
    # reclaim the pre-fingerprint dir (GBs of AOT entries, never read again)
    legacy = os.path.join(os.path.dirname(cache), "xla-tests")
    if os.path.isdir(legacy):
        import shutil

        shutil.rmtree(legacy, ignore_errors=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
