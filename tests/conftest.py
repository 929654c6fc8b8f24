"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (the driver validates the real
multi-chip path separately via __graft_entry__.dryrun_multichip).

Matmul/conv precision is pinned to 'highest' for golden-parity tests —
on TPU the default is bf16-accumulated, which is the production fast path
but not bit-comparable to torch CPU float32.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # Tests are a CORRECTNESS gate, not a benchmark: backend opt level 0
    # skips most LLVM midend work, roughly halving CPU compile time
    # (measured on the dryrun_multichip GAN step: 92 s vs ~180 s), and the
    # suite is compile-dominated on this 1-core host. Golden tolerances are
    # unaffected: opt level changes scheduling/fusion, not math width, and
    # matmul precision stays pinned to 'highest' below.
    + " --xla_backend_optimization_level=0"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# persistent compilation cache: the GAN train-step compile is ~5 min on CPU;
# cached repeat runs make the suite fast. Machine-tagged subdir: CPU AOT
# entries are host-specific and a cache dir can outlive its VM
# (facodec_tpu/utils/cache._machine_tag).
from facodec_tpu.utils.cache import _machine_tag  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", "/tmp/jax_cache_facodec_tests/" + _machine_tag()
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# Late-in-suite persistent-cache WRITES segfault: XLA's CPU
# executable.serialize() crashes inside the jax compilation-cache write
# (compilation_cache.put_executable_and_time) — but only after ~200 prior
# tests' compiles in the same process (round 5: reproduced 4x at the
# identical stack, in whichever module compiled a big executable next —
# test_train_loop, then test_train_step after that module stopped writing;
# each module alone passes and persists fine). Upstream XLA
# state-dependence; workaround: after TRIP_AFTER tests, raise the
# min-compile-time gate (checked in compiler.py BEFORE serialize) so the
# rest of the run skips cache writes. Reads stay warm; to PERSIST the
# late heavy entries (train loop/step, validate), run those files in
# their own pytest process.
_CACHE_WRITE_GUARD = {"count": 0, "tripped": False}
_TRIP_AFTER = 150


def pytest_runtest_setup(item):
    _CACHE_WRITE_GUARD["count"] += 1
    if (_CACHE_WRITE_GUARD["count"] > _TRIP_AFTER
            and not _CACHE_WRITE_GUARD["tripped"]):
        _CACHE_WRITE_GUARD["tripped"] = True
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10**9)
