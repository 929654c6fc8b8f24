"""Snake-family activations and misc nonlinearities (NTC layout).

Snake (x + (1/a)·sin²(ax)) is the codec's signature periodic activation
(reference dac/nn/layers.py:18-33; SnakeBeta modules/quantize.py:29-90).
It is purely elementwise / memory-bound: under jit XLA fuses it into the
surrounding convs, and a Pallas fusion with the alias-free resampler exists
in facodec_tpu/ops/pallas/.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """x + (alpha + 1e-9)^-1 * sin^2(alpha * x); alpha broadcasts over (B, T)."""
    return x + jnp.square(jnp.sin(alpha * x)) / (alpha + 1e-9)


class Snake1d(nn.Module):
    """Per-channel learnable-frequency snake (reference dac/nn/layers.py:27-33).

    Input (B, T, C); parameter kept in the torch shape (1, C, 1) so checkpoint
    conversion is a plain copy.
    """

    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param("alpha", lambda *_: jnp.ones((1, self.channels, 1)), ())
        a = alpha.reshape(1, 1, self.channels)
        return snake(x, a)


class SnakeBeta(nn.Module):
    """Snake with separate magnitude parameter:
    x + 1/(beta + 1e-9) * sin^2(alpha * x), optionally log-scale parameters
    (reference modules/quantize.py:29-90). Input (B, T, C)."""

    in_features: int
    alpha_logscale: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.alpha_logscale:
            init = lambda *_: jnp.zeros((self.in_features,))
        else:
            init = lambda *_: jnp.ones((self.in_features,))
        alpha = self.param("alpha", init, ())
        beta = self.param("beta", init, ())
        a = alpha[None, None, :]
        b = beta[None, None, :]
        if self.alpha_logscale:
            a = jnp.exp(a)
            b = jnp.exp(b)
        return x + jnp.square(jnp.sin(x * a)) / (b + 1e-9)


def mish(x: jnp.ndarray) -> jnp.ndarray:
    """x * tanh(softplus(x)) (reference modules/style_encoder.py:6-10)."""
    return x * jnp.tanh(nn.softplus(x))
