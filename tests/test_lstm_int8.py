"""W8A8 int8 recurrent LSTM path (FACODEC_LSTM_INT8, nn/lstm.py).

Batch-1 latency feature: decoder-width w_hh (18.9 MB bf16) overflows VMEM
and streams every scan step; int8 halves it. These tests pin the three
properties the flag must keep: size-gated activation (encoder layers stay
bf16), f32-level accuracy at flagship width, and per-step quantization
scales (chunked == one-shot bit-exact, unlike the pooled conv scales of the
"int8" policy — see ops/precision.py docstring).
"""

import jax.numpy as jnp
import numpy as np

from facodec_tpu.nn import lstm as L


def _layer_weights(hidden, rng):
    bound = 1.0 / np.sqrt(hidden)
    u = lambda *s: jnp.asarray(rng.uniform(-bound, bound, s), jnp.float32)
    return u(4 * hidden, hidden), u(4 * hidden, hidden), u(4 * hidden), u(4 * hidden)


def test_int8_gate_is_size_and_env_gated(monkeypatch):
    monkeypatch.delenv("FACODEC_LSTM_INT8", raising=False)
    assert not L._lstm_int8(1536)  # off by default
    monkeypatch.setenv("FACODEC_LSTM_INT8", "1")
    assert L._lstm_int8(1536)  # decoder width: 18.9 MB bf16 > VMEM
    assert not L._lstm_int8(1024)  # encoder width: 8.4 MB, already resident


def test_int8_matches_f32_at_flagship_width(monkeypatch):
    hidden, B, T = 1536, 2, 64
    rng = np.random.default_rng(0)
    w_ih, w_hh, b_ih, b_hh = _layer_weights(hidden, rng)
    x = jnp.asarray(rng.standard_normal((B, T, hidden)), jnp.float32)
    h0 = c0 = jnp.zeros((B, hidden))

    monkeypatch.delenv("FACODEC_LSTM_INT8", raising=False)
    y_f32, hT, cT = L.lstm_layer(x, w_ih, w_hh, b_ih, b_hh, h0, c0)
    monkeypatch.setenv("FACODEC_LSTM_INT8", "1")
    y_i8, hT8, cT8 = L.lstm_layer(x, w_ih, w_hh, b_ih, b_hh, h0, c0)

    # measured headroom ~2x: max |diff| 1.6e-3 over 64 steps (y rms 0.137);
    # a LOOSE bound here so the test pins "no accumulation blow-up", not noise
    np.testing.assert_allclose(y_i8, y_f32, atol=5e-3)
    np.testing.assert_allclose(hT8, hT, atol=5e-3)
    np.testing.assert_allclose(cT8, cT, atol=1e-2)  # c is pre-tanh, wider range


def test_int8_chunked_equals_one_shot(monkeypatch):
    """Per-step activation scales depend only on that step's h, so carrying
    (h, c) across a chunk boundary reproduces the one-shot scan bit-exactly
    — the property that makes the flag streaming-safe."""
    monkeypatch.setenv("FACODEC_LSTM_INT8", "1")
    hidden, B, T, split = 1536, 1, 32, 13
    rng = np.random.default_rng(1)
    w_ih, w_hh, b_ih, b_hh = _layer_weights(hidden, rng)
    x = jnp.asarray(rng.standard_normal((B, T, hidden)), jnp.float32)
    h0 = c0 = jnp.zeros((B, hidden))

    y_full, hT, cT = L.lstm_layer(x, w_ih, w_hh, b_ih, b_hh, h0, c0)
    y_a, h_a, c_a = L.lstm_layer(x[:, :split], w_ih, w_hh, b_ih, b_hh, h0, c0)
    y_b, h_b, c_b = L.lstm_layer(x[:, split:], w_ih, w_hh, b_ih, b_hh, h_a, c_a)

    np.testing.assert_array_equal(np.asarray(y_full), np.concatenate([y_a, y_b], 1))
    np.testing.assert_array_equal(np.asarray(hT), np.asarray(h_b))
    np.testing.assert_array_equal(np.asarray(cT), np.asarray(c_b))


def test_int8_flag_noop_below_threshold(monkeypatch):
    """At sub-threshold width the flag must be a structural no-op: flag on
    and off take the identical bf16 path and produce bit-identical output."""
    hidden = 64  # far below FACODEC_LSTM_INT8_MIN_BYTES -> same path
    rng = np.random.default_rng(2)
    w_ih, w_hh, b_ih, b_hh = _layer_weights(hidden, rng)
    x = jnp.asarray(rng.standard_normal((2, 16, hidden)), jnp.float32)
    h0 = c0 = jnp.zeros((2, hidden))
    monkeypatch.setenv("FACODEC_LSTM_INT8", "0")
    y_off, _, _ = L.lstm_layer(x, w_ih, w_hh, b_ih, b_hh, h0, c0)
    monkeypatch.setenv("FACODEC_LSTM_INT8", "1")
    y_on, _, _ = L.lstm_layer(x, w_ih, w_hh, b_ih, b_hh, h0, c0)
    np.testing.assert_array_equal(np.asarray(y_off), np.asarray(y_on))
