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
import os
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
    # SELECTIVE W8A8 dynamic quantization: convs with fan-in (I*K) >=
    # INT8_MIN_FANIN round their operands to int8 (weights per-output-
    # channel, activations per-batch-row — both scalings commute EXACTLY
    # with the convolution, so the only error is the ±0.5 rounding of each
    # operand) and contract on the int8 MXU at 2x the bf16 peak (v5e: 394
    # TOPS vs 197; measured 1.78-1.8x at 768/1536ch, scripts/
    # bench_int8_conv.py). Everything else behaves as bfloat16_act. The
    # selectivity is load-bearing: quantizing EVERY conv measured 382x RTF
    # vs 490x hybrid end to end — the abs-max + round/cast passes over the
    # huge narrow-stage activations (16x240000x96) cost more than the 1.38x
    # MXU win there, while the wide stages (small T, big fan-in) keep
    # nearly the full 1.8x. INFERENCE-ONLY: round() has zero gradient.
    # Decode-only use ("hybrid_int8") keeps codes bit-exact; streaming
    # sessions should not use it (the dynamic activation scale pools over
    # whatever tensor it sees, so chunked != one-shot).
    "int8": "int8",
    "w8a8": "int8",
}

# convs at or above this fan-in (C_in * K) quantize under the "int8"
# policy; below it they run as bfloat16_act. Default catches the decoder's
# 768/1536ch stages (fan-in 5376/10752) where the int8 MXU win survives
# the quantize-pass overhead, and skips 384ch (2688) and below — measured
# end to end: threshold 0 (quantize everything) 382x RTF, 4096 494x, vs
# 490x plain hybrid (batch 16x10 s round trip, bench.py).
INT8_MIN_FANIN = int(os.environ.get("FACODEC_INT8_MIN_FANIN", "4096"))

_BF16 = ("bfloat16", "bfloat16_act", "int8")  # int8 = bf16_act + wide-conv W8A8

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
    """The dtype conv/matmul layers RETURN: f32 except under bfloat16_act /
    int8, where activations stay bf16 between layers."""
    return (
        jnp.bfloat16
        if _POLICY in ("bfloat16_act", "int8")
        else jnp.float32
    )


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


def is_int8(fan_in: int) -> bool:
    """Whether a conv with this fan-in (C_in * K) quantizes to int8 under
    the current policy (see INT8_MIN_FANIN)."""
    return _POLICY == "int8" and fan_in >= INT8_MIN_FANIN


def quantize_dynamic(x: jnp.ndarray, axes) -> tuple:
    """Symmetric dynamic int8 quantization: (int8 values, f32 scale with
    keepdims over `axes`). x/scale is rounded to [-127, 127]; the scale
    floor keeps all-zero slices finite (they quantize to exact zeros)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale
