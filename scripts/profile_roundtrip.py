"""Op-level profile of the flagship codec round trip on the attached TPU.

Captures a jax.profiler device trace of ONE already-cached round-trip
execution (batch 16 x 10 s, the bench.py headline point), then aggregates
the trace events by op/fusion name and prints the top-k time sinks.

Usage:  python scripts/profile_roundtrip.py [batch] [seconds]
Output: a table of {op name, total ms, %% of device time} + trace dir.
"""

from __future__ import annotations

import glob
import gzip
import json
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

    logdir = "/tmp/facodec_prof"
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        out = fn(params, wave)
    s = float(out)
    jax.profiler.stop_trace()
    print("traced, scalar:", s)

    # Parse the trace protobuf-JSON (trace.json.gz written by xprof)
    files = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    if not files:
        files = sorted(glob.glob(logdir + "/**/trace.json.gz", recursive=True))
    print("trace files:", files)
    if not files:
        print("NO TRACE JSON — inspect", logdir)
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Identify device-side process ids (TPU / device compute lanes)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower() or "Device" in n}
    print("processes:", pid_names)
    agg = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        agg[name] = agg.get(name, 0.0) + dur
        total += dur
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    print(f"\n== top ops by device time (total {total:.1f} ms across 3 iters) ==")
    for name, ms in top:
        print(f"{ms:9.2f} ms  {100*ms/max(total,1e-9):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    s = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    main(b, s)
