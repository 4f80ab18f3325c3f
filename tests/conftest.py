"""Test harness: run everything on a simulated 8-device CPU backend.

The reference had no test suite at all (SURVEY.md §4); multi-GPU was only
exercised by actually running ``--mGPUs``.  Here the same pjit code path
that runs on a TPU slice runs on 8 virtual CPU devices, so sharding and
collective behaviour is covered in CI without hardware.

Env vars must be set before jax initialises, hence module scope.
"""

import os

# Force, don't setdefault: the machine environment pins JAX_PLATFORMS=axon
# (the tunneled TPU); tests must run on the local CPU backend.  The host's
# sitecustomize (PYTHONPATH=/root/.axon_site) pre-imports jax before this
# conftest runs, so setting os.environ["JAX_PLATFORMS"] alone is too late —
# jax.config.update works as long as no backend has initialised yet.
os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent XLA compile cache: the CLI smoke tests spawn subprocesses
# that each recompile the train/eval programs from scratch; the cache
# (keyed by HLO hash — safe across code edits) cuts warm suite runs by
# ~30% on the compile-heavy tests.  Env var (not jax.config) so child
# processes inherit it.  CPU-only: the TPU relay must NOT see a
# persistent cache (it hangs the backend — .claude/skills/verify).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/scda_jax_cache")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.hookimpl(hookwrapper=True)
def pytest_collection_modifyitems(config, items):
    # Record the FULL collected count before -m/-k deselection (builtin
    # filtering runs inside this hook; the wrapper sees the pre-filter
    # list).  tests/test_doc_counts.py pins README's stated test count
    # to this so the r2-r4 doc-drift class can't recur silently.
    config._scda_full_collected = len(items)
    yield
