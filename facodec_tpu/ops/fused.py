"""Trace-time switch for the fused Pallas fast paths (ops/pallas/resunit.py).

Default OFF — and nothing in the shipping inference path turns it on: the
fused resunit kernel MEASURED SLOWER than XLA at every codec width
(CLAUDE.md round-3 record: Mosaic pads the (T,64)x(64,64) taps to full
(128,128) MXU tiles), so the gate exists for A/B benchmarking
(`FACODEC_FUSED=1`) and regression tests, not production. The golden-parity
and streaming-exactness tests pin the XLA composition bit-for-bit; the
fused kernels differ from it by f32 summation order (~1e-6).

IMPORTANT: the flag is read at TRACE time inside module __call__. jit caches
traces — flipping the flag after a function has been compiled does NOT
retrace it. Set it once, before first use, or use separate wrapper
functions per setting (as tests/test_fused_resunit.py does).

`FACODEC_FUSED=0/1` overrides programmatic settings.
"""

from __future__ import annotations

import os

_STATE = {"enabled": False}


def enable_fused(on: bool = True) -> None:
    _STATE["enabled"] = bool(on)


def fused_enabled() -> bool:
    env = os.environ.get("FACODEC_FUSED")
    if env is not None:
        return env not in ("0", "false", "False", "")
    return _STATE["enabled"]


# --- pipelined 2-layer LSTM (nn/lstm.lstm_2layer_pipelined) -----------------
# Separate gate: unlike the Pallas resunit this path is pure XLA and matches
# the sequential composition to f32 rounding (layer 2's input projection
# moves from one hoisted matmul into the scan; same K-dim reduction). Same
# trace-time caveat as above applies.

_LSTM_STATE = {"enabled": False}


def enable_pipelined_lstm(on: bool = True) -> None:
    _LSTM_STATE["enabled"] = bool(on)


def pipelined_lstm_enabled() -> bool:
    env = os.environ.get("FACODEC_LSTM_PIPELINED")
    if env is not None:
        return env not in ("0", "false", "False", "")
    return _LSTM_STATE["enabled"]
