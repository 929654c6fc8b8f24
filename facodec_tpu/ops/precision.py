"""Mixed-precision policy for the matmul/conv compute path.

TPU-first design: the MXU is bfloat16-native — a bf16 x bf16 -> f32 matmul
runs at twice the f32 throughput and halves the HBM traffic of the operands.
The policy here casts ONLY the matmul/conv operands to bf16 and keeps f32
everywhere it matters for parity with the reference:

  * accumulation is always f32 (`preferred_element_type=jnp.float32`), so
    layer outputs, activations, residual sums, losses and optimizer state
    stay float32;
  * the VQ code path is an exact island — `VectorQuantize.in_proj/out_proj`
    opt out via `exact=True` and the normalized-distance math in
    ops/vq_math.py is always f32 — preserving the bit-exact-codes property
    as far as numerically possible (the encoder latent feeding the VQ is
    still bf16-rounded; see tests/test_precision.py);
  * parameters are stored and updated in f32 (the cast is part of the traced
    forward, so gradients flow through it and arrive in f32).

The policy is a trace-time constant read while JAX traces the model. Entry
points (api.FACodec, bench.py, train steps) wrap their functions in
`policy(...)` so every trace — including re-traces on new shapes — sees the
intended precision; two models with different policies never share a traced
program because each wraps its own closures.

The reference (pure fp32 PyTorch, no AMP anywhere in /root/reference) has no
equivalent; this is a TPU-native performance feature, guarded by parity
tests instead of reference goldens.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax.numpy as jnp

_ALIASES = {
    "float32": "float32",
    "f32": "float32",
    "fp32": "float32",
    "bfloat16": "bfloat16",
    "bf16": "bfloat16",
    # bf16 operands AND bf16 layer outputs: activations stay bfloat16
    # between layers, halving the HBM traffic of every elementwise op in the
    # chain (snake, residual adds, pads). Elementwise math still computes in
    # f32 registers (see nn/activations.snake); matmul/conv accumulation is
    # f32 as always. Decode-only use keeps codes bit-exact ("hybrid" bench).
    "bfloat16_act": "bfloat16_act",
    "bf16_act": "bfloat16_act",
}

_BF16 = ("bfloat16", "bfloat16_act")

_POLICY = "float32"


def _check(name: str) -> str:
    try:
        return _ALIASES[str(name).lower()]
    except KeyError:
        raise ValueError(
            f"unknown precision policy {name!r}; expected one of {sorted(_ALIASES)}"
        ) from None


def set_policy(name: str) -> None:
    """Set the global matmul precision policy ('float32' or 'bfloat16')."""
    global _POLICY
    _POLICY = _check(name)


def get_policy() -> str:
    return _POLICY


@contextlib.contextmanager
def policy(name: Optional[str]):
    """Scoped policy override; None leaves the current policy in place."""
    global _POLICY
    old = _POLICY
    if name is not None:
        _POLICY = _check(name)
    try:
        yield
    finally:
        _POLICY = old


def compute_dtype():
    """The dtype matmul/conv operands are cast to under the current policy."""
    return jnp.bfloat16 if _POLICY in _BF16 else jnp.float32


def out_dtype():
    """The dtype conv/matmul layers RETURN: f32 except under bfloat16_act,
    where activations stay bf16 between layers."""
    return jnp.bfloat16 if _POLICY == "bfloat16_act" else jnp.float32


def _castable(x) -> bool:
    return x is not None and jnp.issubdtype(x.dtype, jnp.floating)


def cast_operands(*xs):
    """Cast float arrays to the policy compute dtype (no-op under float32)."""
    if _POLICY not in _BF16:
        return xs if len(xs) != 1 else xs[0]
    out = tuple(x.astype(jnp.bfloat16) if _castable(x) else x for x in xs)
    return out if len(out) != 1 else out[0]


def matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Policy-precision matmul with f32 accumulation/output."""
    a, b = cast_operands(a, b)
    return jnp.matmul(a, b, preferred_element_type=jnp.float32)
