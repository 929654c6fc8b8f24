"""Numerical-debugging helpers (SURVEY.md §5 'race detection / sanitizers').

The reference's only hook is a commented-out
`torch.autograd.set_detect_anomaly` (train.py:40). JAX gives stronger
guarantees by construction (pure functions — no data races) plus:

  * `enable_nan_checks()` — global `jax_debug_nans`/`jax_debug_infs`: every
    jitted computation re-runs eagerly on NaN/Inf and points at the
    producing primitive;
  * `checked(fn)` — `checkify` wrapper that turns NaN/div/OOB-index errors
    inside a jitted fn into returned, raiseable errors without leaving
    compiled mode (usable inside the training loop);
  * `assert_finite(tree)` — host-side guard for checkpoints/metrics.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def enable_nan_checks(infs: bool = True) -> None:
    jax.config.update("jax_debug_nans", True)
    if infs:
        jax.config.update("jax_debug_infs", True)


def disable_nan_checks() -> None:
    jax.config.update("jax_debug_nans", False)
    jax.config.update("jax_debug_infs", False)


def checked(fn: Callable, *, jit: bool = True) -> Callable:
    """Wrap fn with checkify float/index checks; the wrapper raises on the
    host if any check fired. Stays inside compiled execution."""
    cfn = checkify.checkify(
        fn, errors=checkify.float_checks | checkify.index_checks
    )
    if jit:
        cfn = jax.jit(cfn)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def assert_finite(tree: Any, name: str = "tree") -> None:
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.isfinite(leaf).all()):
                key = "/".join(str(p) for p in path)
                raise FloatingPointError(f"non-finite values in {name}:{key}")
