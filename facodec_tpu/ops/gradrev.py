"""Gradient reversal as a `jax.custom_vjp`.

The adversarial disentanglement mechanism of the factorized quantizer
(reference: /root/reference/gradient_reversal.py:11-35): identity in the
forward pass, `-alpha * grad` in the backward pass. In JAX this is a pure
custom-VJP function — no autograd Function subclassing, and XLA fuses the
negation into whatever surrounds it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def gradient_reversal(x: jnp.ndarray, alpha: float = 1.0) -> jnp.ndarray:
    return x


def _fwd(x, alpha):
    return x, None


def _bwd(alpha, _res, g):
    return (jax.tree_util.tree_map(lambda t: -alpha * t, g),)


gradient_reversal.defvjp(_fwd, _bwd)
