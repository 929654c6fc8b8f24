"""Parity tests for LSTM, snake activations, alias-free resampling, STFT."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from facodec_tpu.nn.lstm import LSTM, SLSTM
from facodec_tpu.nn.activations import Snake1d, SnakeBeta, mish
from facodec_tpu.nn.alias_free import (
    UpSample1d,
    DownSample1d,
    kaiser_sinc_filter1d,
)
from facodec_tpu.ops.spectral import hann_window, stft, mel_filterbank
from facodec_tpu.ops.gradrev import gradient_reversal
from facodec_tpu.ops.vq_math import l2_normalize, nearest_code

TOL = dict(rtol=1e-5, atol=1e-5)


def t2j(x):
    return jnp.asarray(x.detach().numpy())


def nct_to_ntc(x):
    return jnp.transpose(t2j(x), (0, 2, 1))


def assert_close_nct(jax_ntc, torch_nct, tol=None):
    got = np.transpose(np.asarray(jax_ntc), (0, 2, 1))
    np.testing.assert_allclose(got, torch_nct.detach().numpy(), **(tol or TOL))


# ---------------------------------------------------------------- LSTM


@pytest.mark.parametrize("layers", [1, 2])
def test_lstm_matches_torch(layers):
    torch.manual_seed(0)
    tm = torch.nn.LSTM(6, 6, layers)
    x = torch.randn(9, 2, 6)  # (T, B, C)
    want, (h, c) = tm(x)

    params = {}
    for k, v in tm.state_dict().items():
        params[k] = t2j(v)
    m = LSTM(6, 6, layers)
    got, (hj, cj) = m.apply({"params": params}, jnp.swapaxes(t2j(x), 0, 1))
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(got), 0, 1), want.detach().numpy(), **TOL
    )
    np.testing.assert_allclose(np.asarray(hj), h.detach().numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(cj), c.detach().numpy(), **TOL)


def test_lstm_state_chunking_is_exact():
    """Carrying (h, c) across chunks == one full pass (streaming invariant)."""
    m = LSTM(4, 4, 2)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 20, 4))
    params = m.init(key, x)
    full, _ = m.apply(params, x)
    y1, st = m.apply(params, x[:, :7])
    y2, st = m.apply(params, x[:, 7:15], st)
    y3, _ = m.apply(params, x[:, 15:], st)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2, y3], axis=1)), np.asarray(full), rtol=1e-5, atol=1e-5
    )


def test_lstm_pipelined_matches_stacked():
    """The diagonal-wavefront 2-layer scan (nn/lstm.lstm_2layer_pipelined)
    computes the exact same recurrence as the stacked per-layer scans —
    including explicit-state chunking and the T=1 prologue/epilogue path.
    (f32-rounding-level tolerance: CPU XLA fuses the loop body differently
    from the standalone prologue; on TPU the step math is bit-identical.)"""
    from facodec_tpu.ops.fused import enable_pipelined_lstm

    m = LSTM(6, 6, 2)
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (3, 19, 6))
    params = m.init(key, x)
    tol = dict(rtol=1e-6, atol=1e-6)
    try:
        enable_pipelined_lstm(False)
        want, (h, c) = m.apply(params, x)
        enable_pipelined_lstm(True)
        got, (hp, cp) = m.apply(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), **tol)
        np.testing.assert_allclose(np.asarray(hp), np.asarray(h), **tol)
        np.testing.assert_allclose(np.asarray(cp), np.asarray(c), **tol)
        # explicit-state chunking, incl. a single-step (prologue+epilogue) chunk
        y1, st = m.apply(params, x[:, :1])
        y2, st = m.apply(params, x[:, 1:8], st)
        y3, _ = m.apply(params, x[:, 8:], st)
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate([y1, y2, y3], axis=1)),
            np.asarray(want), **tol,
        )
    finally:
        enable_pipelined_lstm(False)


def test_slstm_skip():
    torch.manual_seed(1)
    tm = torch.nn.LSTM(5, 5, 2)
    x = torch.randn(2, 5, 11)  # NCT
    xt = x.permute(2, 0, 1)
    y, _ = tm(xt)
    want = (y + xt).permute(1, 2, 0)

    params = {"lstm": {k: t2j(v) for k, v in tm.state_dict().items()}}
    m = SLSTM(5, 2)
    got = m.apply({"params": params}, nct_to_ntc(x))
    assert_close_nct(got, want)


# ---------------------------------------------------------------- activations


def test_snake_matches_torch():
    torch.manual_seed(2)
    x = torch.randn(2, 8, 13)
    alpha = torch.rand(1, 8, 1) + 0.5
    want = x + (alpha + 1e-9).reciprocal() * torch.sin(alpha * x).pow(2)
    m = Snake1d(8)
    got = m.apply({"params": {"alpha": t2j(alpha)}}, nct_to_ntc(x))
    assert_close_nct(got, want)


@pytest.mark.parametrize("logscale", [False, True])
def test_snakebeta_matches_torch(logscale):
    torch.manual_seed(3)
    x = torch.randn(2, 6, 9)
    alpha = torch.rand(6)
    beta = torch.rand(6)
    a = alpha[None, :, None]
    b = beta[None, :, None]
    if logscale:
        a, b = a.exp(), b.exp()
    want = x + (1.0 / (b + 1e-9)) * torch.sin(x * a).pow(2)
    m = SnakeBeta(6, alpha_logscale=logscale)
    got = m.apply({"params": {"alpha": t2j(alpha), "beta": t2j(beta)}}, nct_to_ntc(x))
    assert_close_nct(got, want)


def test_fast_sin2_accuracy():
    """The polynomial sin^2 (nn/activations.py) must match f64 sin^2 as
    closely as f32 exact-sin does — i.e. the approximation adds NO error
    beyond f32 argument rounding, at every activation scale."""
    from facodec_tpu.nn.activations import sin2

    rng = np.random.RandomState(0)
    for scale in (3.0, 30.0, 300.0, 3000.0, 2.5e4):
        x = rng.uniform(-scale, scale, 100000).astype(np.float32)
        ref64 = np.sin(x.astype(np.float64)) ** 2
        got = np.asarray(sin2(jnp.asarray(x)))
        exact32 = np.sin(x) ** 2
        err_fast = np.abs(got - ref64).max()
        err_exact = np.abs(exact32 - ref64).max()
        assert err_fast <= max(2 * err_exact, 3e-7), (scale, err_fast, err_exact)


def test_fast_sin2_out_of_range_graceful():
    """Beyond the validated reduction range the argument is clamped: the
    output must stay finite and in [0, 1] even at f32-max-scale inputs
    (a diverged alpha would otherwise produce inf*k NaNs)."""
    from facodec_tpu.nn.activations import sin2

    x = np.array([-3.4e38, -1e9, -1e6, 1e6, 1e9, 3.4e38, np.float32(3e4)],
                 np.float32)
    got = np.asarray(sin2(jnp.asarray(x)))
    assert np.all(np.isfinite(got))
    assert np.all(got >= 0.0) and np.all(got <= 1.0 + 1e-6)


def test_mish_matches_torch():
    x = torch.linspace(-5, 5, 101)
    want = x * torch.tanh(F.softplus(x))
    got = mish(t2j(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), **TOL)


# ---------------------------------------------------------------- alias-free


def _torch_kaiser_sinc(cutoff, half_width, kernel_size):
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    A = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if A > 50.0:
        beta = 0.1102 * (A - 8.7)
    elif A >= 21.0:
        beta = 0.5842 * (A - 21) ** 0.4 + 0.07886 * (A - 21.0)
    else:
        beta = 0.0
    window = torch.kaiser_window(kernel_size, beta=beta, periodic=False)
    if even:
        time = torch.arange(-half_size, half_size) + 0.5
    else:
        time = torch.arange(kernel_size) - half_size
    filt = 2 * cutoff * window * torch.sinc(2 * cutoff * time)
    filt = filt / filt.sum()
    return filt


@pytest.mark.parametrize("ratio,ks", [(2, 12), (2, None), (3, None)])
def test_kaiser_filter_matches_torch(ratio, ks):
    ks = int(6 * ratio // 2) * 2 if ks is None else ks
    want = _torch_kaiser_sinc(0.5 / ratio, 0.6 / ratio, ks)
    got = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, ks)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("ratio", [2, 3])
def test_upsample1d_matches_torch(ratio):
    torch.manual_seed(4)
    x = torch.randn(2, 3, 40)
    ks = int(6 * ratio // 2) * 2
    filt = _torch_kaiser_sinc(0.5 / ratio, 0.6 / ratio, ks).view(1, 1, -1)
    pad = ks // ratio - 1
    pad_left = pad * ratio + (ks - ratio) // 2
    pad_right = pad * ratio + (ks - ratio + 1) // 2
    xp = F.pad(x, (pad, pad), mode="replicate")
    y = ratio * F.conv_transpose1d(xp, filt.expand(3, -1, -1), stride=ratio, groups=3)
    want = y[..., pad_left:-pad_right]

    m = UpSample1d(ratio)
    got = m.apply({}, nct_to_ntc(x))
    assert_close_nct(got, want)


@pytest.mark.parametrize("ratio", [2, 3])
def test_downsample1d_matches_torch(ratio):
    torch.manual_seed(5)
    x = torch.randn(2, 3, 41)
    ks = int(6 * ratio // 2) * 2
    filt = _torch_kaiser_sinc(0.5 / ratio, 0.6 / ratio, ks).view(1, 1, -1)
    even = ks % 2 == 0
    pl, pr = ks // 2 - int(even), ks // 2
    xp = F.pad(x, (pl, pr), mode="replicate")
    want = F.conv1d(xp, filt.expand(3, -1, -1), stride=ratio, groups=3)

    m = DownSample1d(ratio)
    got = m.apply({}, nct_to_ntc(x))
    assert_close_nct(got, want)


# ---------------------------------------------------------------- spectral


def test_hann_window_matches_torch():
    got = hann_window(1200)
    want = torch.hann_window(1200, periodic=True)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("T", [2400, 3001])
def test_stft_matches_torch(T):
    torch.manual_seed(6)
    x = torch.randn(2, T)
    want = torch.stft(
        x,
        n_fft=2048,
        hop_length=300,
        win_length=1200,
        window=torch.hann_window(1200),
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )  # (B, F, frames)
    got = stft(t2j(x), 2048, 300, 1200)  # (B, frames, F)
    got = np.transpose(np.asarray(got), (0, 2, 1))
    np.testing.assert_allclose(got.real, want.real.numpy(), rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(got.imag, want.imag.numpy(), rtol=1e-3, atol=2e-3)


def test_mel_filterbank_properties():
    fb = np.asarray(mel_filterbank(1025, 80, 24000))
    assert fb.shape == (1025, 80)
    assert (fb >= 0).all()
    # every filter has nonzero support and unit-free triangular peaks <= 1
    assert (fb.sum(axis=0) > 0).all()
    assert fb.max() <= 1.0 + 1e-6
    # HTK spot check: mel(700 Hz) = 2595*log10(2)
    from facodec_tpu.ops.spectral import _hz_to_mel_htk

    np.testing.assert_allclose(_hz_to_mel_htk(np.array(700.0)), 2595 * np.log10(2.0))


# ---------------------------------------------------------------- vq / gradrev


def test_l2_normalize_matches_torch():
    torch.manual_seed(7)
    x = torch.randn(40, 8)
    x[0] = 0  # eps path
    want = F.normalize(x)
    got = l2_normalize(t2j(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), **TOL)


def test_nearest_code_matches_torch_argmin():
    torch.manual_seed(8)
    enc = torch.randn(100, 8)
    cb = torch.randn(1024, 8)
    e = F.normalize(enc)
    c = F.normalize(cb)
    dist = e.pow(2).sum(1, keepdim=True) - 2 * e @ c.t() + c.pow(2).sum(1, keepdim=True).t()
    want_idx = (-dist).max(1)[1]
    idx, quant = nearest_code(t2j(enc), t2j(cb))
    np.testing.assert_array_equal(np.asarray(idx), want_idx.numpy())
    np.testing.assert_allclose(np.asarray(quant), cb[want_idx].numpy(), **TOL)


def test_gradient_reversal():
    f = lambda x: jnp.sum(gradient_reversal(x, 2.0) ** 1)
    g = jax.grad(f)(jnp.ones((3,)))
    np.testing.assert_allclose(np.asarray(g), -2.0 * np.ones(3))
    y = gradient_reversal(jnp.arange(3.0), 2.0)
    np.testing.assert_allclose(np.asarray(y), np.arange(3.0))


def test_debug_checked_catches_nan():
    import pytest as _pytest
    import jax.numpy as jnp

    from facodec_tpu.utils.debug import assert_finite, checked

    f = checked(lambda x: jnp.log(x))
    f(jnp.ones(4))  # fine
    with _pytest.raises(Exception):
        f(-jnp.ones(4))  # log of negative -> NaN -> raised

    assert_finite({"a": jnp.ones(3)})
    with _pytest.raises(FloatingPointError):
        assert_finite({"a": jnp.asarray([1.0, float("nan")])})
