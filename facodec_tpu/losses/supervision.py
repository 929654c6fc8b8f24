"""Supervision losses for the predictor heads and their training targets.

Reference semantics:
  * FocalLoss(gamma=2) (/root/reference/losses.py:264-276) — note the
    reference applies the focal weight to the *batch-mean* CE, reproduced
    exactly.
  * smooth-L1 (huber, beta=1) for f0/uv (train.py:322-326).
  * cross-entropy for speaker logits (train.py:344-348).
  * `log_norm` frame-energy target (modules/commons.py:176-181).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over leading dims; logits (..., C), int labels (...)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def focal_loss(logits: jnp.ndarray, labels: jnp.ndarray, gamma: float = 2.0) -> jnp.ndarray:
    """Focal weighting applied to the mean CE, exactly like the reference
    (losses.py:271-275: `logp = CE(input, target); (1-exp(-logp))^g * logp`)."""
    logp = cross_entropy(logits, labels)
    p = jnp.exp(-logp)
    return jnp.power(1.0 - p, gamma) * logp


def smooth_l1_loss(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """torch F.smooth_l1_loss (mean reduction)."""
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < beta, 0.5 * jnp.square(d) / beta, d - 0.5 * beta))


def log_norm(
    x: jnp.ndarray, mean: float = -4.0, std: float = 4.0, axis: int = -1
) -> jnp.ndarray:
    """Frame energy from a normalized log-mel: log ||exp(x*std+mean)||_2 over
    the mel axis (modules/commons.py:176-181). x (B, T, n_mels) -> (B, T)."""
    return jnp.log(jnp.linalg.norm(jnp.exp(x * std + mean), axis=axis))
