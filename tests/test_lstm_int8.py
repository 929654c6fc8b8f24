"""W8A8 int8 recurrent LSTM path (FACODEC_LSTM_INT8, nn/lstm.py).

Batch-1 latency feature: decoder-width w_hh (18.9 MB bf16) overflows VMEM
and streams every scan step; int8 halves it. These tests pin the properties
the flag must keep: size-gated activation (encoder layers stay bf16),
policy-gated activation (float32 parity gates stay exact even with the env
flag leaked process-wide), f32-level accuracy at flagship width, per-step
quantization scales (chunked == one-shot bit-exact, unlike the pooled conv
scales of the "int8" policy — see ops/precision.py docstring), and
precedence over the pipelined wavefront path (which has no int8 matmul).
"""

import jax.numpy as jnp
import numpy as np

from facodec_tpu.nn import lstm as L
from facodec_tpu.ops.precision import policy


def _layer_weights(hidden, rng, in_size=None):
    bound = 1.0 / np.sqrt(hidden)
    u = lambda *s: jnp.asarray(rng.uniform(-bound, bound, s), jnp.float32)
    return (
        u(4 * hidden, in_size or hidden),
        u(4 * hidden, hidden),
        u(4 * hidden),
        u(4 * hidden),
    )


def test_int8_gate_is_size_env_and_policy_gated(monkeypatch):
    monkeypatch.delenv("FACODEC_LSTM_INT8", raising=False)
    with policy("bfloat16_act"):
        assert not L._lstm_int8(1536)  # off by default
    monkeypatch.setenv("FACODEC_LSTM_INT8", "1")
    with policy("bfloat16_act"):
        assert L._lstm_int8(1536)  # decoder width: 18.9 MB bf16 > VMEM
        assert not L._lstm_int8(1024)  # encoder width: 8.4 MB, already resident
    # float32 policy (parity/validate gates) must stay exact even when the
    # env flag leaks process-wide (advisor round 4)
    with policy("float32"):
        assert not L._lstm_int8(1536)


def test_int8_matches_f32_at_flagship_width(monkeypatch):
    hidden, B, T = 1536, 2, 64
    rng = np.random.default_rng(0)
    w_ih, w_hh, b_ih, b_hh = _layer_weights(hidden, rng)
    x = jnp.asarray(rng.standard_normal((B, T, hidden)), jnp.float32)
    h0 = c0 = jnp.zeros((B, hidden))

    monkeypatch.delenv("FACODEC_LSTM_INT8", raising=False)
    y_f32, hT, cT = L.lstm_layer(x, w_ih, w_hh, b_ih, b_hh, h0, c0)
    monkeypatch.setenv("FACODEC_LSTM_INT8", "1")
    with policy("bfloat16_act"):  # the policy the flag actually ships under
        y_i8, hT8, cT8 = L.lstm_layer(x, w_ih, w_hh, b_ih, b_hh, h0, c0)

    # measured headroom ~2x: max |diff| 1.6e-3 over 64 steps (y rms 0.137);
    # a LOOSE bound here so the test pins "no accumulation blow-up", not noise
    np.testing.assert_allclose(y_i8, y_f32, atol=5e-3)
    np.testing.assert_allclose(hT8, hT, atol=5e-3)
    np.testing.assert_allclose(cT8, cT, atol=1e-2)  # c is pre-tanh, wider range


def test_int8_noop_under_float32_policy(monkeypatch):
    """Under policy('float32') the flag must be a structural no-op: on and
    off produce bit-identical output (the parity/validate gates' contract)."""
    hidden = 1536
    rng = np.random.default_rng(3)
    w_ih, w_hh, b_ih, b_hh = _layer_weights(hidden, rng)
    x = jnp.asarray(rng.standard_normal((1, 8, hidden)), jnp.float32)
    h0 = c0 = jnp.zeros((1, hidden))
    with policy("float32"):
        monkeypatch.setenv("FACODEC_LSTM_INT8", "0")
        y_off, _, _ = L.lstm_layer(x, w_ih, w_hh, b_ih, b_hh, h0, c0)
        monkeypatch.setenv("FACODEC_LSTM_INT8", "1")
        y_on, _, _ = L.lstm_layer(x, w_ih, w_hh, b_ih, b_hh, h0, c0)
    np.testing.assert_array_equal(np.asarray(y_off), np.asarray(y_on))


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

    with policy("bfloat16_act"):
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
    with policy("bfloat16_act"):
        monkeypatch.setenv("FACODEC_LSTM_INT8", "0")
        y_off, _, _ = L.lstm_layer(x, w_ih, w_hh, b_ih, b_hh, h0, c0)
        monkeypatch.setenv("FACODEC_LSTM_INT8", "1")
        y_on, _, _ = L.lstm_layer(x, w_ih, w_hh, b_ih, b_hh, h0, c0)
    np.testing.assert_array_equal(np.asarray(y_off), np.asarray(y_on))


def test_int8_takes_precedence_over_pipelined(monkeypatch):
    """FACODEC_LSTM_PIPELINED=1 + FACODEC_LSTM_INT8=1 at a qualifying width
    must run the stacked int8 path, not silently measure the bf16 wavefront
    (advisor round 4). Checked by output equality with the explicitly
    stacked int8 run — the wavefront's bf16 result differs from it."""
    hidden, B, T = 1536, 1, 6
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((B, T, hidden)), jnp.float32)
    mod = L.SLSTM(dimension=hidden, num_layers=2)
    params = {
        "lstm": {
            k: v
            for layer in range(2)
            for k, v in zip(
                (
                    f"weight_ih_l{layer}",
                    f"weight_hh_l{layer}",
                    f"bias_ih_l{layer}",
                    f"bias_hh_l{layer}",
                ),
                _layer_weights(hidden, rng),
            )
        }
    }
    monkeypatch.setenv("FACODEC_LSTM_INT8", "1")
    with policy("bfloat16_act"):
        monkeypatch.setenv("FACODEC_LSTM_PIPELINED", "0")
        y_stacked = mod.apply({"params": params}, x)
        monkeypatch.setenv("FACODEC_LSTM_PIPELINED", "1")
        y_combined = mod.apply({"params": params}, x)
        # sanity: without int8 the pipelined path is actually taken and its
        # bf16 arithmetic differs from the stacked int8 result
        monkeypatch.setenv("FACODEC_LSTM_INT8", "0")
        y_wavefront = mod.apply({"params": params}, x)
    np.testing.assert_array_equal(np.asarray(y_combined), np.asarray(y_stacked))
    assert not np.array_equal(np.asarray(y_wavefront), np.asarray(y_stacked))
