"""Op-level profile of the flagship codec round trip on the attached TPU.

Captures a jax.profiler device trace of ONE already-cached round-trip
execution (batch 16 x 10 s, the bench.py headline point), then aggregates
the trace events by op/fusion name and prints the top-k time sinks.

Usage:  python scripts/profile_roundtrip.py [batch] [seconds]
Output: a table of {op name, total ms, %% of device time} + trace dir.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from facodec_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

from __graft_entry__ import FLAGSHIP  # noqa: E402
from bench import SR, HOP, _build_models, _roundtrip_fn  # noqa: E402


def main(batch=16, seconds=10.0):
    import os

    prec = os.environ.get("FACODEC_BENCH_PRECISION", "float32")
    models, params = _build_models()
    frames = int(seconds * SR) // HOP
    T = frames * HOP
    wave = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (batch, T), jnp.float32)

    fn = jax.jit(_roundtrip_fn(models, prec))
    # warmup / compile (cached from bench runs)
    float(fn(params, wave))
    float(fn(params, wave))

    from facodec_tpu.utils.profiling import aggregate_device_trace, trace

    logdir = "/tmp/facodec_prof"
    with trace(logdir):
        for _ in range(3):
            out = fn(params, wave)
        s = float(out)
    print("traced, scalar:", s)
    try:
        aggregate_device_trace(logdir)
    except FileNotFoundError as e:
        # the tunnel sometimes wedges and xprof writes nothing (CLAUDE.md)
        print(f"NO TRACE JSON ({e}) — inspect {logdir}")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    s = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    main(b, s)
