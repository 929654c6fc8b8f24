"""Profiling / tracing utilities (SURVEY.md §5 'Tracing / profiling').

The reference's only instrumentation is a wall-clock step timer logged to
TensorBoard (train.py:175, 380, 394). Here:

  * `trace(logdir)` — context manager around `jax.profiler` producing a
    Perfetto/XProf trace of device execution;
  * `StepTimer` — wall-clock step timing with device-completion forcing
    (materializes a scalar — `block_until_ready` is unreliable on tunneled
    platforms);
  * `annotate(name)` — TraceAnnotation for labeling host-side regions.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "/tmp/facodec_trace", create_perfetto_link: bool = False):
    """Capture a device trace: view with XProf/TensorBoard or Perfetto."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a host-side region in the trace."""
    return jax.profiler.TraceAnnotation(name)


def force_completion(tree: Any) -> float:
    """Block until a pytree of device arrays has actually been computed by
    materializing a scalar reduction on the host. Returns the scalar."""
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    acc = 0.0
    for x in leaves[:1]:  # one leaf suffices: executions are ordered
        acc += float(jnp.sum(jnp.abs(x.astype(jnp.float32))))
    return acc


def aggregate_device_trace(logdir: str, top_k: int = 40, printout: bool = True,
                           group_depth: int = 3):
    """Aggregate an xprof trace (written by `trace()`) by device op.

    Only leaf op events (the device's "XLA Ops" lane) are counted — the
    "Steps" / "XLA Modules" lanes are containers that span everything and
    would double-count. Two aggregations are produced:
      * by fusion/op NAME — which compiled op is hot;
      * by SOURCE ATTRIBUTION — the `source` (file:line) arg xprof carries
        on each op when available, else the HLO op_name metadata path
        truncated to `group_depth` components — which model code is hot.
    Returns (by_name sorted [(name, ms)], by_module sorted, total_ms). This
    is the attribution workflow that drove the round-2 perf wins (CLAUDE.md):
    profile -> fix top sink -> re-measure END TO END."""
    import glob
    import gzip
    import json
    import re

    files = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    if not files:
        files = sorted(glob.glob(logdir + "/**/trace.json.gz", recursive=True))
    if not files:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    with gzip.open(files[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "Device" in n}
    op_lanes = {k for k, n in tid_names.items()
                if k[0] in dev_pids and "XLA Ops" in n}
    # container lanes span every leaf op; if the leaf lane is named
    # something other than "XLA Ops" we still must EXCLUDE containers or
    # totals double-count (the pid-only fallback below is for traces with
    # no thread metadata at all)
    container_lanes = {
        k for k, n in tid_names.items()
        if k[0] in dev_pids and any(t in n for t in ("Step", "Module", "Framework"))
    }
    meta_re = re.compile(r'op_name="([^"]+)"')
    by_name: dict = {}
    by_mod: dict = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("tid"))
        if op_lanes:
            if key not in op_lanes:
                continue
        elif dev_pids:
            if e.get("pid") not in dev_pids or key in container_lanes:
                continue  # no "XLA Ops" lane: device pids minus containers
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        by_name[name] = by_name.get(name, 0.0) + dur
        args = e.get("args", {})
        mod = args.get("source", "")
        if not mod:
            m = meta_re.search(args.get("long_name", ""))
            mod = ("/".join(m.group(1).split("/")[:group_depth])
                   if m else "(no attribution)")
        by_mod[mod] = by_mod.get(mod, 0.0) + dur
        total += dur
    top = sorted(by_name.items(), key=lambda kv: -kv[1])
    top_mod = sorted(by_mod.items(), key=lambda kv: -kv[1])
    if printout:
        print(f"\n== top ops by device time (total {total:.1f} ms) ==")
        for name, ms in top[:top_k]:
            print(f"{ms:9.2f} ms  {100 * ms / max(total, 1e-9):5.1f}%  {name[:110]}")
        print("\n== by source attribution ==")
        for name, ms in top_mod[:top_k]:
            print(f"{ms:9.2f} ms  {100 * ms / max(total, 1e-9):5.1f}%  {name[:110]}")
    return top, top_mod, total


class StepTimer:
    """Rolling step timer: `with timer.step(): ...` then `timer.p50()`."""

    def __init__(self, window: int = 100):
        self.window = window
        self.times = []

    @contextlib.contextmanager
    def step(self, result: Optional[Any] = None):
        t0 = time.perf_counter()
        box = {}
        yield box
        if "result" in box:
            force_completion(box["result"])
        elif result is not None:
            force_completion(result)
        self.times.append(time.perf_counter() - t0)
        if len(self.times) > self.window:
            self.times.pop(0)

    def p50(self) -> float:
        return float(np.percentile(self.times, 50)) if self.times else float("nan")

    def p99(self) -> float:
        return float(np.percentile(self.times, 99)) if self.times else float("nan")

    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else float("nan")
