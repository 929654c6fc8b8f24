"""Multi-layer unidirectional LSTM as a `lax.scan` recurrence.

TPU-native design: the input projection for the whole sequence is hoisted out
of the recurrence as one big (B*T, C) x (C, 4H) MXU matmul; the scan carries
only the (h, c) state and performs the (B, H) x (H, 4H) recurrent matmul per
step. Gate ordering and parameter naming match `torch.nn.LSTM`
(weight_ih_l{k} (4H, in), weight_hh_l{k} (4H, H), bias_ih/bias_hh), so the
reference's SLSTM weights (dac/model/encodec.py:272-288) convert 1:1.

The explicit (h, c) carry is what makes chunked streaming inference exact —
see facodec_tpu/models/streaming.py.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from facodec_tpu.ops.precision import cast_operands, matmul, quantize_dynamic

LSTMState = Tuple[jnp.ndarray, jnp.ndarray]  # (h, c) each (num_layers, B, H)


def _scan_unroll() -> int:
    """Scan unroll factor (trace-time). Besides amortizing while-loop
    overhead, unroll sets the w_hh HBM reuse window: XLA reloads the
    recurrent weight once per unrolled group, so at batch 1 (where the
    18.9 MB decoder w_hh dominates) traffic scales as |w_hh|/unroll.
    Batch-16 measurements showed no effect (compute-bound there)."""
    return int(os.environ.get("FACODEC_LSTM_UNROLL", "8"))


def _lstm_int8(hidden: int) -> bool:
    """Whether this layer's recurrent matmul runs W8A8 int8 (trace-time).

    Opt-in via FACODEC_LSTM_INT8=1, and only for layers whose w_hh does NOT
    fit VMEM in bf16: the decoder's 1536-wide w_hh (4H x H = 18.9 MB bf16)
    overflows the 16 MB VMEM scoped stack and streams from HBM every scan
    step — the measured batch-1 bottleneck (~5.4 ms/layer at 800 steps;
    CLAUDE.md round 4). int8 halves that weight traffic (9.4 MB) and may fit
    residency like the encoder's 8.4 MB bf16 w_hh (~2.5 us/step) does.
    Layers that already fit (encoder, 1024-wide: 8.4 MB) keep the bf16 path —
    quantization would only add per-step VPU work there.

    MEASURED ON TPU (round 5, scripts/bench_lstm_int8.py): a 2.4% LOSS at
    batch 1 (204.9/205.5x vs 209.9/210.5x bf16, reproducible) — the per-step
    dequant + h-quantization VPU work on the scan's critical path outweighs
    the halved weight traffic at (1,1536)x(1536,6144). Kept as an opt-in
    experiment flag only; never a default.

    INFERENCE-ONLY (round() has zero gradient); training entry points never
    set the flag. Streaming-safe: the activation scale is per STEP (each
    step's h only), so chunked == one-shot is preserved, unlike the pooled
    per-tensor conv activation scales under the "int8" policy.

    Also requires a non-float32 active precision policy: parity/validate
    gates trace under policy("float32") and must stay exact even if the env
    flag leaks in process-wide (advisor round 4). Under float32, the flag is
    a no-op.

    Takes precedence over FACODEC_LSTM_PIPELINED for qualifying widths: the
    pipelined 2-layer wavefront has no int8 recurrent path, so LSTM.__call__
    falls back to stacked layers when this returns True (otherwise a
    combined-flags bench would silently measure bf16)."""
    if os.environ.get("FACODEC_LSTM_INT8", "0") != "1":
        return False
    from facodec_tpu.ops.precision import get_policy

    if get_policy() == "float32":
        return False
    min_bytes = int(os.environ.get("FACODEC_LSTM_INT8_MIN_BYTES", str(12 << 20)))
    return 4 * hidden * hidden * 2 >= min_bytes


def _torch_lstm_init(hidden_size: int):
    bound = 1.0 / math.sqrt(hidden_size)

    def init(rng, shape, dtype=jnp.float32):
        return jax.random.uniform(rng, shape, dtype, minval=-bound, maxval=bound)

    return init


def lstm_layer(
    x: jnp.ndarray,
    w_ih: jnp.ndarray,
    w_hh: jnp.ndarray,
    b_ih: jnp.ndarray,
    b_hh: jnp.ndarray,
    h0: jnp.ndarray,
    c0: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One LSTM layer over (B, T, C). Returns (y (B,T,H), hT, cT)."""
    # Hoist the input projection out of the scan: one MXU matmul for all steps.
    # Both matmuls follow the bf16 precision policy (f32 accumulation); the
    # (h, c) carry and the gate nonlinearities stay f32 so recurrent state
    # does not accumulate rounding across time steps.
    # recurrent state is ALWAYS f32 (bf16 carries would accumulate rounding
    # across time steps; under bfloat16_act the incoming h0/c0 may be bf16)
    h0 = h0.astype(jnp.float32)
    c0 = c0.astype(jnp.float32)
    x_proj = matmul(x, w_ih.T) + (b_ih + b_hh)  # (B, T, 4H)
    hidden = w_hh.shape[1]

    if _lstm_int8(hidden):
        # W8A8 recurrent matmul: w_hh per-output-column int8 (quantized once,
        # outside the scan), h per-step per-row — both scalings commute
        # exactly with the contraction, so the only error vs bf16 is the
        # +-0.5 ulp rounding of each operand. See _lstm_int8 for when/why.
        w_q, w_scale = quantize_dynamic(w_hh.T, axes=0)  # (H,4H) i8, (1,4H)

        def rec_gates(h):
            h_q, s_h = quantize_dynamic(h, axes=-1)  # (B,H) i8, (B,1)
            i32 = jax.lax.dot_general(
                h_q, w_q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return i32.astype(jnp.float32) * (s_h * w_scale)
    else:
        w_hh_t = cast_operands(w_hh.T)  # (H, 4H), cast once outside the scan

        def rec_gates(h):
            return matmul(h, w_hh_t)

    def step(carry, xp_t):
        h, c = carry
        h_new, c_new = _lstm_cell(xp_t + rec_gates(h), c)
        return (h_new, c_new), h_new

    xs = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 4H) scan over time
    # unroll amortizes per-step loop overhead and widens the w_hh HBM reuse
    # window (see _scan_unroll); the recurrence itself is the serial floor
    (hT, cT), ys = jax.lax.scan(step, (h0, c0), xs, unroll=_scan_unroll())
    return jnp.swapaxes(ys, 0, 1), hT, cT


def _lstm_cell(gates: jnp.ndarray, c: jnp.ndarray):
    """Gate nonlinearities + state update from pre-activation gates (B, 4H)."""
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def lstm_2layer_pipelined(
    x: jnp.ndarray,
    layer_params,  # [(w_ih, w_hh, b_ih, b_hh)] * 2, torch shapes
    h0: jnp.ndarray,  # (2, B, H)
    c0: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Both LSTM layers in ONE diagonal-wavefront scan: at step t, layer 1
    consumes x[t] while layer 2 consumes layer 1's output from step t-1 —
    the two cell updates are independent, so the sequential depth is T+1
    steps instead of the 2T of two stacked scans. The per-step while-loop
    overhead (~7 us at flagship width, the dominant LSTM cost: the (B, H) x
    (H, 4H) recurrent matmul fills only B of the MXU's 128 rows) is paid
    half as many times. Exact same arithmetic per layer — layer 2's input
    projection moves from one hoisted matmul into the scan (same K-dim
    reduction, bit-identical on TPU), which is what the halved step count
    pays for.

    The reference runs cuDNN's fused 2-layer kernel (nn.LSTM,
    /root/reference/dac/model/encodec.py:272-288); this is the TPU
    equivalent of that cross-layer pipelining.
    """
    (w_ih1, w_hh1, b_ih1, b_hh1), (w_ih2, w_hh2, b_ih2, b_hh2) = layer_params
    T = x.shape[1]
    h0 = h0.astype(jnp.float32)
    c0 = c0.astype(jnp.float32)

    # layer 1 input projection hoisted: one big MXU matmul for all steps
    xp1 = matmul(x, w_ih1.T) + (b_ih1 + b_hh1)  # (B, T, 4H)
    w_hh1_t = cast_operands(w_hh1.T)  # (H, 4H)
    # layer 2's projections stay TWO matmuls summed in the same order as the
    # stacked path ((y1 @ w_ih + b) + (h @ w_hh)) so the pipelined scan is
    # bit-identical to it, not merely close
    w_ih2_t = cast_operands(w_ih2.T)
    w_hh2_t = cast_operands(w_hh2.T)
    b2 = b_ih2 + b_hh2

    def l2_gates(y1, h2):
        return (matmul(y1, w_ih2_t) + b2) + matmul(h2, w_hh2_t)

    # prologue: layer 1 alone on step 0
    h1, c1 = _lstm_cell(xp1[:, 0] + matmul(h0[0], w_hh1_t), c0[0])
    h2, c2 = h0[1], c0[1]
    y1_prev = h1

    def step(carry, xp_t):
        h1, c1, h2, c2, y1_prev = carry
        h1n, c1n = _lstm_cell(xp_t + matmul(h1, w_hh1_t), c1)
        h2n, c2n = _lstm_cell(l2_gates(y1_prev, h2), c2)
        return (h1n, c1n, h2n, c2n, h1n), h2n

    if T > 1:
        xs = jnp.swapaxes(xp1[:, 1:], 0, 1)  # (T-1, B, 4H)
        (h1, c1, h2, c2, y1_prev), ys = jax.lax.scan(
            step, (h1, c1, h2, c2, y1_prev), xs, unroll=_scan_unroll()
        )
        ys = jnp.swapaxes(ys, 0, 1)  # (B, T-1, H) = y2[0 .. T-2]
    else:
        ys = jnp.zeros((x.shape[0], 0, w_hh2.shape[1]), h1.dtype)

    # epilogue: layer 2 alone drains the last pending layer-1 output
    h2, c2 = _lstm_cell(l2_gates(y1_prev, h2), c2)
    y = jnp.concatenate([ys, h2[:, None]], axis=1)  # (B, T, H)
    return y, jnp.stack([h1, h2]), jnp.stack([c1, c2])


class LSTM(nn.Module):
    """torch-compatible stacked LSTM over NTC input with explicit state I/O."""

    input_size: int
    hidden_size: int
    num_layers: int = 1

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, state: Optional[LSTMState] = None
    ) -> Tuple[jnp.ndarray, LSTMState]:
        B = x.shape[0]
        H = self.hidden_size
        init = _torch_lstm_init(H)
        if state is None:
            h0 = jnp.zeros((self.num_layers, B, H), x.dtype)
            c0 = jnp.zeros((self.num_layers, B, H), x.dtype)
        else:
            h0, c0 = state
        layer_params = []
        for layer in range(self.num_layers):
            in_size = self.input_size if layer == 0 else H
            layer_params.append((
                self.param(f"weight_ih_l{layer}", init, (4 * H, in_size)),
                self.param(f"weight_hh_l{layer}", init, (4 * H, H)),
                self.param(f"bias_ih_l{layer}", init, (4 * H,)),
                self.param(f"bias_hh_l{layer}", init, (4 * H,)),
            ))

        from facodec_tpu.ops.fused import pipelined_lstm_enabled

        # the wavefront path has no int8 recurrent matmul — when the int8
        # flag qualifies for this width, the stacked path wins precedence
        # (advisor round 4: a combined-flags run would otherwise silently
        # ignore FACODEC_LSTM_INT8 for exactly the decoder SLSTM it targets)
        if self.num_layers == 2 and pipelined_lstm_enabled() and not _lstm_int8(H):
            y, hT, cT = lstm_2layer_pipelined(x, layer_params, h0, c0)
            return y, (hT, cT)

        hs, cs = [], []
        y = x
        for layer, (w_ih, w_hh, b_ih, b_hh) in enumerate(layer_params):
            y, hT, cT = lstm_layer(y, w_ih, w_hh, b_ih, b_hh, h0[layer], c0[layer])
            hs.append(hT)
            cs.append(cT)
        return y, (jnp.stack(hs), jnp.stack(cs))


class SLSTM(nn.Module):
    """Skip-connected LSTM block sitting mid-encoder/decoder
    (reference dac/model/encodec.py:272-288). NTC in/out."""

    dimension: int
    num_layers: int = 2
    skip: bool = True

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, state: Optional[LSTMState] = None, return_state: bool = False
    ):
        y, new_state = LSTM(
            self.dimension, self.dimension, self.num_layers, name="lstm"
        )(x, state)
        if self.skip:
            y = y + x
        if return_state:
            return y, new_state
        return y
