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

# --- fast sin^2 -------------------------------------------------------------
# XLA's f32 `sin` on TPU does Payne-Hanek-accurate range reduction: ~140 VPU
# ops/element, which made snake the single largest time sink in the codec
# round trip (9.2 ms per application at (16, 240000, 64); see
# scripts/bench_conv_fusion.py). Snake only needs sin^2, so the sign of the
# reduced argument is irrelevant: reduce mod pi (3-constant Cody-Waite) and
# evaluate an odd degree-13 minimax polynomial -> ~14 ops/element. Max abs
# error vs f64 matches f32 jnp.sin squared through |x| <= 2.5e4 (k*_PI_A
# exact for k < 2^13; 2.5e-7 at |x|<3, dominated by f32 argument rounding
# beyond that, ~6e-7 at the 3e4 clamp boundary) — validated in
# tests/test_primitives.py::test_fast_sin2_accuracy. Beyond |x| = _SIN2_RANGE
# the argument is CLAMPED: snake inputs are unbounded during training, and
# without the clamp a diverged alpha*x (>~1e6) would silently produce wrong
# reductions (k*PI_A rounding) or inf-k NaNs; clamped, the output stays
# bounded and finite (sin^2 of a diverged activation is arbitrary in [0,1]
# either way — the clamp makes the failure graceful, not silent garbage).

_PI_A = 3.140625  # 11 significand bits: k*_PI_A exact for k < 2^13
_PI_B = 9.6750259399414062e-4  # next 12 bits of pi
_PI_C = 1.5099580252808664e-07  # remainder (f32)
_SIN2_RANGE = 3.0e4  # validated f32-sin-accuracy range of the reduction
_SIN_COEFFS = (  # fdlibm __kernel_sin minimax, f32-truncated
    -1.6666667163e-01, 8.3333337680e-03, -1.9841270114e-04,
    2.7557314297e-06, -2.5050759689e-08, 1.5896910177e-10,
)


def sin2(x: jnp.ndarray) -> jnp.ndarray:
    """sin(x)^2 at f32-sin accuracy for |x| <= 2.5e4 in ~14 elementwise ops
    (vs ~140 for XLA's exactly-range-reduced sin); clamped (bounded, finite,
    approximate) beyond |x| = 3e4."""
    x = jnp.clip(x, -_SIN2_RANGE, _SIN2_RANGE)
    k = jnp.round(x * (1.0 / jnp.pi))
    t = ((x - k * _PI_A) - k * _PI_B) - k * _PI_C  # [-pi/2, pi/2] mod pi
    t2 = t * t
    p = _SIN_COEFFS[-1]
    for c in _SIN_COEFFS[-2::-1]:
        p = p * t2 + c
    s = t + t * t2 * p
    return s * s


def snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """x + (alpha + 1e-9)^-1 * sin^2(alpha * x); alpha broadcasts over (B, T).

    The divide happens on the (1, 1, C) parameter, not the activation tensor
    (XLA does not strength-reduce a broadcast divide on its own). Under the
    bfloat16_act policy x arrives bf16: the math still runs in f32 registers
    (alpha is f32, so the products promote) and only the RESULT is rounded
    back — in-register casts are free, HBM traffic is halved."""
    recip = 1.0 / (alpha + 1e-9)
    return (x + sin2(alpha * x) * recip).astype(x.dtype)


class Snake1d(nn.Module):
    """Per-channel learnable-frequency snake (reference dac/nn/layers.py:27-33).

    Input (B, T, C); parameter kept in the torch shape (1, C, 1) so checkpoint
    conversion is a plain copy.
    """

    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, alpha_only: bool = False):
        alpha = self.param("alpha", lambda *_: jnp.ones((1, self.channels, 1)), ())
        if alpha_only:
            return alpha  # torch-shape (1, C, 1); for the fused kernel
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
        return (x + sin2(x * a) * (1.0 / (b + 1e-9))).astype(x.dtype)


def mish(x: jnp.ndarray) -> jnp.ndarray:
    """x * tanh(softplus(x)) (reference modules/style_encoder.py:6-10)."""
    return x * jnp.tanh(nn.softplus(x))
