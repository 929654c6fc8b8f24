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
