"""Training-target transforms that run inside the jitted step.

  * `normalize_f0`: the reference's per-utterance voiced-only log2-norm of
    raw F0 (train.py:218-256), vectorized over the batch with masks instead
    of the reference's per-sample Python loop (no dynamic shapes under jit).
  * `log_norm` energy ('uv') target lives in losses/supervision.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_f0(f0: jnp.ndarray, voiced_threshold: float = 5.0) -> jnp.ndarray:
    """(B, T) raw F0 (Hz) -> per-utterance normalized log2-F0 with unvoiced
    frames set to -10 (reference train.py:222-256).

    mean/std are over voiced frames only; std uses the unbiased (n-1)
    estimator to match torch .std(). Utterances with no voiced frames map to
    all -10; NaN/Inf are replaced with -10.
    """
    voiced = f0 > voiced_threshold
    n = jnp.sum(voiced, axis=-1, keepdims=True).astype(f0.dtype)
    log_f0 = jnp.log2(jnp.maximum(f0, 1e-10))
    vlog = jnp.where(voiced, log_f0, 0.0)
    mean = jnp.sum(vlog, axis=-1, keepdims=True) / jnp.maximum(n, 1.0)
    sq = jnp.where(voiced, jnp.square(log_f0 - mean), 0.0)
    std = jnp.sqrt(jnp.sum(sq, axis=-1, keepdims=True) / jnp.maximum(n - 1.0, 1.0))
    normalized = (log_f0 - mean) / jnp.maximum(std, 1e-10)
    out = jnp.where(voiced, normalized, -10.0)
    out = jnp.where(n > 0, out, -10.0)
    out = jnp.where(jnp.isfinite(out), out, -10.0)
    return out
