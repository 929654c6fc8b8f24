"""Analytic latency/delay API (models/latency.py) vs empirical measurement.

The reference derives its delay analytically (dac/model/base.py:82-123) and
verifies the receptive field empirically with a gradient-support probe
(dac/model/dac.py:369-386). Same strategy here: the analytic conv-chain
numbers must match the support of d(output)/d(input) on real (tiny,
LSTM-free) models.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from facodec_tpu.models.dac import Decoder, Encoder
from facodec_tpu.models.latency import (
    codec_latency,
    decoder_conv_chain,
    encoder_conv_chain,
    input_length,
    output_length,
    receptive_span,
)

STRIDES = (2, 3)
RATES = (3, 2)
HOP = 6


def _grad_support(f, x_len):
    """Indices of input samples one scalar output depends on."""
    g = jax.grad(f)(jnp.zeros((x_len,), jnp.float32))
    return np.nonzero(np.asarray(g) != 0.0)[0]


@pytest.fixture(scope="module")
def tiny_enc():
    enc = Encoder(d_model=4, strides=STRIDES, d_latent=8, causal=True, lstm=0)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 10 * HOP, 1)))["params"]
    return enc, params


@pytest.fixture(scope="module")
def tiny_dec():
    dec = Decoder(input_channel=8, channels=8, rates=RATES, causal=True, lstm=0)
    params = dec.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 8)))["params"]
    return dec, params


def test_output_input_length_inverse():
    for chain in (encoder_conv_chain(STRIDES), decoder_conv_chain(RATES),
                  encoder_conv_chain((2, 5, 5, 6)), decoder_conv_chain((6, 5, 5, 2))):
        for n in (1, 3, 17):
            l_in = input_length(chain, n)
            assert output_length(chain, l_in) >= n
            # minimality: one fewer input sample loses an output
            assert output_length(chain, l_in - 1) < n


def test_encoder_receptive_field_empirical(tiny_enc):
    """Gradient support of the LAST latent frame == analytic conv RF, and
    nothing before it (causal: no lookahead is trivially true for the last
    frame; the bound is the history side). T must exceed the RF: torch-style
    reflect padding mirrors windows that cross sample 0 onto FUTURE samples,
    which would contaminate the measurement near the start."""
    enc, params = tiny_enc
    rf = receptive_span(encoder_conv_chain(STRIDES))
    assert rf == input_length(encoder_conv_chain(STRIDES), 1)  # no convT: equal
    T = 100 * HOP
    assert T > rf + HOP

    def last_frame(x):
        y = enc.apply({"params": params}, x[None, :, None])
        return jnp.sum(y[0, -1])

    support = _grad_support(last_frame, T)
    assert support.max() == T - 1
    assert support.min() == T - rf, (
        f"empirical RF {T - support.min()} != analytic {rf}"
    )


def test_encoder_causal_no_lookahead(tiny_enc):
    """A latent frame t must not see past sample (t+1)*hop — the
    lookahead=0 claim of the causal config. t is chosen so the history
    window stays inside the signal (see reflect-pad note above)."""
    enc, params = tiny_enc
    rf = receptive_span(encoder_conv_chain(STRIDES))
    T = 100 * HOP
    t = rf // HOP + 10

    def frame_t(x):
        y = enc.apply({"params": params}, x[None, :, None])
        return jnp.sum(y[0, t])

    support = _grad_support(frame_t, T)
    assert support.max() == (t + 1) * HOP - 1, (
        f"frame {t} sees sample {support.max()} >= {(t + 1) * HOP}"
    )


def test_decoder_receptive_field_empirical(tiny_dec):
    """Gradient support over the last output hop: causal in frames, bounded
    by the analytic decoder frame RF (exact worst-phase interval math,
    receptive_span), and tight (== RF) for at least one output phase."""
    dec, params = tiny_dec
    rf_frames = receptive_span(decoder_conv_chain(RATES))
    F = rf_frames + 12
    worst = 0
    for s in range(F * HOP - HOP, F * HOP):
        def sample_s(z, s=s):
            y = dec.apply({"params": params}, z[None, :, None].repeat(8, axis=2))
            return y[0, s, 0]

        sup = _grad_support(sample_s, F)
        assert sup.max() <= s // HOP  # causal in frames
        span = sup.max() - sup.min() + 1
        assert span <= rf_frames, f"phase {s}: span {span} > analytic {rf_frames}"
        worst = max(worst, span)
    assert worst == rf_frames, f"empirical {worst} != analytic {rf_frames}"


def test_flagship_report_numbers():
    r = codec_latency((2, 5, 5, 6), (6, 5, 5, 2), causal=True,
                      sample_rate=24000, chunk_frames=4)
    assert r.hop == 300
    assert r.lookahead == 0
    assert r.algorithmic_latency == 300            # 12.5 ms
    assert r.ms(r.algorithmic_latency) == 12.5
    assert r.chunk_latency == 1200                 # 50 ms
    assert r.first_emission is not None and r.first_emission % 1200 == 0
    # priming must cover the documented reflect spans (BASELINE.md ~137 ms)
    assert r.first_emission >= 11 * 300
    d = r.as_dict()
    assert d["first_emission_ms"] == r.ms(r.first_emission)
    assert "algorithmic latency" in str(r)


def test_report_matches_streaming_session():
    """first_emission agrees with a real StreamingFACodec session's
    prime_frames (shared arithmetic, but wired through different paths)."""
    from facodec_tpu.models.fa_quantizer import FAquantizer
    from facodec_tpu.models.streaming import StreamingFACodec

    enc = Encoder(d_model=4, strides=(2, 5, 5, 6), d_latent=16, causal=True, lstm=1)
    dec = Decoder(input_channel=16, channels=8, rates=(6, 5, 5, 2), causal=True, lstm=1)
    qt = FAquantizer(
        in_dim=16, n_p_codebooks=1, n_c_codebooks=2, n_t_codebooks=2,
        n_r_codebooks=3, codebook_size=8, codebook_dim=4, causal=True,
        separate_prosody_encoder=True, timbre_norm=True,
        style_hidden_dim=16, prosody_hidden_dim=8,
    )
    sess = StreamingFACodec(encoder=enc, quantizer=qt, decoder=dec,
                            params={}, chunk_frames=4)
    r = codec_latency((2, 5, 5, 6), (6, 5, 5, 2), causal=True, chunk_frames=4)
    assert r.first_emission == sess.prime_frames * 300
