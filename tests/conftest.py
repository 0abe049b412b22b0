"""Test harness config: force CPU JAX with 8 virtual devices so multi-chip sharding
paths (Mesh/pjit/shard_map) are exercised without TPU hardware (SURVEY.md §4).

Note: this environment's sitecustomize registers an `axon` TPU backend in every
process and JAX_PLATFORMS=axon is pinned in the env, so the env-var route is not
enough — we must override via jax.config after import."""
import os
import sys

# zero-egress environment: make HF hub lookups fail fast instead of hanging
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache for the CPU test suite: e2e tests are compile-bound on
# this 1-CPU host (round-1 suite ~35 min); caching makes every rerun start warm.
# The dir is scoped by a CPU-feature fingerprint: $HOME can persist across driver
# hosts with different CPUs, and loading a foreign host's CPU AOT executables risks
# SIGILL (xla cpu_aot_loader warns exactly that) and numeric drift.
import hashlib as _hashlib

try:
    with open("/proc/cpuinfo") as _f:
        _flags = next(l for l in _f if l.startswith("flags"))
except (OSError, StopIteration):
    import platform as _platform

    _flags = _platform.processor() or "unknown"
_fp = _hashlib.sha1(_flags.encode()).hexdigest()[:10]
_test_cache = os.path.join(os.path.expanduser("~"), ".cache", "mammodissect",
                           f"xla-tests-{_fp}")
# reclaim the pre-fingerprint cache dir (GBs of AOT entries, never read again)
import shutil as _shutil

_legacy = os.path.join(os.path.expanduser("~"), ".cache", "mammodissect", "xla-tests")
if os.path.isdir(_legacy):
    _shutil.rmtree(_legacy, ignore_errors=True)
os.makedirs(_test_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _test_cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


import pytest as _pytest


@_pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """JAX's in-process program/trace caches accumulate across the ~190-test suite and
    progressively slow late modules (measured: test_resume 126 s standalone vs 552 s
    at the end of a full run). Dropping the caches per module keeps dispatch flat;
    recompiles are absorbed by the persistent disk cache above."""
    yield
    jax.clear_caches()
