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
# Dir is CPU-feature-fingerprinted (tests/_cpu_cache.py) and shared with the
# real-multihost worker subprocesses.
from tests._cpu_cache import enable as _enable_test_cache

_enable_test_cache(jax)


import pytest as _pytest


@_pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """JAX's in-process program/trace caches accumulate across the ~190-test suite and
    progressively slow late modules (measured: test_resume 126 s standalone vs 552 s
    at the end of a full run). Dropping the caches per module keeps dispatch flat;
    recompiles are absorbed by the persistent disk cache above."""
    yield
    jax.clear_caches()
