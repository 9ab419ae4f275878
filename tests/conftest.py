"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding code paths are exercised on CPU via
``--xla_force_host_platform_device_count=8`` (no TPU hardware needed for
correctness tests); benchmarks run separately on real TPU hardware.
These env vars must be set before jax is imported anywhere.
"""

import os

# force CPU: the ambient environment may pin JAX_PLATFORMS to a TPU platform
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# quiet XLA's AOT-loader machine-feature lines: every persistent-cache load
# logs an E-level wall of text because compile-time tuning flags
# (prefer-no-scatter/gather) are compared as if they were CPU features
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

# this jax build re-appends the ambient TPU platform at import time; pin the
# config explicitly (must happen before the first backend query)
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite's per-module jax.clear_caches()
# (see _bound_compile_cache_growth below) would otherwise recompile every
# shared program per module, and the plane-graph/SPMD tests pay multi-minute
# XLA:CPU LLVM compiles on every run. Disk-cached executables reload in ~ms.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache_tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _bound_compile_cache_growth():
    """Drop live executables between test modules.

    A long single-process run accumulates XLA:CPU executables across ~200
    jit signatures; past a threshold the NEXT LLVM compilation segfaults
    (observed repeatedly at ~70-80% of the suite, always inside
    backend_compile_and_load, at varying tests). Clearing per module bounds
    the live set and keeps the documented single-process gate green.
    """
    yield
    jax.clear_caches()


#: XLA:CPU segfaults (SIGSEGV/abort inside backend_compile_and_load or the
#: persistent-cache loader) when roughly the 18th distinct mesh/SPMD
#: program is compiled or cache-loaded between two jax.clear_caches()
#: calls -- diagnosed 2026-08-21 by bisection: tests/test_parallel.py was
#: green for four rounds at 16 such programs, appending two more made the
#: LAST test in the module crash regardless of which test that was, and
#: in-module reordering only moved the victim. The per-module clear (the
#: _bound_compile_cache_growth fixture) resets the accumulation, so mesh-
#: heavy modules must stay below the threshold (the round-5 additions live
#: in tests/test_parallel_sessions.py for exactly this reason); this
#: periodic clear additionally bounds any future module that grows past it.
_CLEAR_EVERY_N_TESTS = 12
_test_counter = {"n": 0}


def pytest_runtest_setup(item):
    _test_counter["n"] += 1
    if _test_counter["n"] % _CLEAR_EVERY_N_TESTS == 0:
        jax.clear_caches()
    # optional RSS trace for diagnosing memory-correlated crashes:
    #   EKS_TPU_RSS_LOG=/tmp/rss.log pytest tests/
    path = os.environ.get("EKS_TPU_RSS_LOG")
    if path:
        try:
            import resource

            rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
            with open(path, "a") as f:
                f.write(f"{rss}MB\t{item.nodeid}\n")
        except Exception:
            pass


REFERENCE_DATA = "/root/reference/data"


def reference_data_available() -> bool:
    return os.path.isdir(REFERENCE_DATA)
