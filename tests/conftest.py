"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``xla_force_host_platform_device_count`` (the TPU substitute for
"multi-node without a real cluster").

NOTE: in this environment the axon TPU plugin ignores the
``JAX_PLATFORMS`` env var, so the backend must be forced via
``jax.config`` after import (before first use).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_parallel_codegen_split_count" not in flags:
    # serialize XLA:CPU LLVM codegen: the parallel splitter has segfaulted
    # compiling slot-machine graphs late in the suite (state-dependent)
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NO persistent compile cache on CPU: XLA:CPU executable (de)serialization
# segfaults on this stack for the slot-machine graphs — observed
# deterministically in compilation_cache.get_executable_and_time (read)
# AND put_executable_and_time (write), even with all jit dispatches on a
# single thread. The engine likewise only enables the cache on non-CPU
# backends. The suite pays ~2x wall time in compiles; correctness wins.

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """XLA:CPU has segfaulted compiling slot-machine graphs late in the
    suite (deterministic position, clean standalone) — an accumulated
    JIT-state bug. Dropping compiled executables between modules keeps
    the compiler's arenas small; modules pay recompiles instead."""
    yield
    jax.clear_caches()
