"""Golden-parity tests for conv layers vs torch (CPU).

These pin the *numerical semantics* of the TPU-native layers to torch's:
padding rules, weight-norm reparameterization, transpose-conv trim, init
bounds. The reference codec's bit-exactness depends on these exactly
(SURVEY.md section 7 'hard parts' #1).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from facodec_tpu.nn.conv import (
    Conv1d,
    ConvTranspose1d,
    SConv1d,
    SConvTranspose1d,
    apply_weight_norm,
)
from facodec_tpu.ops.padding import get_extra_padding_for_conv1d, pad1d, unpad1d

TOL = dict(rtol=1e-5, atol=1e-5)


def t2j(x):
    return jnp.asarray(x.detach().numpy())


def nct_to_ntc(x):
    return jnp.transpose(t2j(x), (0, 2, 1))


def assert_close(jax_ntc, torch_nct, **kw):
    got = np.transpose(np.asarray(jax_ntc), (0, 2, 1))
    want = torch_nct.detach().numpy()
    np.testing.assert_allclose(got, want, **(kw or TOL))


def ref_pad1d(x, paddings, mode="zero", value=0.0):
    """The reference's pad1d semantics (encodec.py:96-113) in torch."""
    length = x.shape[-1]
    pl, pr = paddings
    if mode == "reflect":
        max_pad = max(pl, pr)
        extra = 0
        if length <= max_pad:
            extra = max_pad - length + 1
            x = F.pad(x, (0, extra))
        padded = F.pad(x, paddings, "reflect")
        end = padded.shape[-1] - extra
        return padded[..., :end]
    tmode = {"zero": "constant", "replicate": "replicate"}[mode]
    return F.pad(x, paddings, tmode, value)


@pytest.mark.parametrize("mode", ["zero", "reflect", "replicate"])
@pytest.mark.parametrize("pads", [(0, 0), (3, 2), (6, 11)])
def test_pad1d_matches_torch(mode, pads):
    x = torch.randn(2, 4, 25)
    tmode = {"zero": "constant", "reflect": "reflect", "replicate": "replicate"}[mode]
    want = F.pad(x, pads, mode=tmode)
    got = pad1d(nct_to_ntc(x), pads, mode=mode)
    assert_close(got, want)


def test_pad1d_reflect_short_input():
    # reference encodec.py:103-111: reflect with pad >= length zero-extends first
    x = torch.randn(1, 2, 3)
    # torch reflect would fail for pad 5 > len 3; replicate reference logic:
    length = x.shape[-1]
    max_pad = 5
    extra = max_pad - length + 1
    xt = F.pad(x, (0, extra))
    want = F.pad(xt, (5, 2), mode="reflect")[..., : -extra]
    got = pad1d(nct_to_ntc(x), (5, 2), mode="reflect")
    assert_close(got, want)


@pytest.mark.parametrize(
    "k,s,d,causal,T",
    [
        (7, 1, 1, True, 50),
        (7, 1, 9, True, 50),
        (4, 2, 1, True, 50),
        (10, 5, 1, True, 53),
        (12, 6, 1, True, 61),
        (7, 1, 3, False, 50),
        (10, 5, 1, False, 47),
        (3, 1, 1, True, 20),
        (1, 1, 1, True, 20),
    ],
)
def test_sconv1d_matches_reference_semantics(k, s, d, causal, T):
    """SConv1d == pad1d(reference rule) + plain conv, vs torch."""
    torch.manual_seed(0)
    cin, cout = 6, 8
    w = torch.randn(cout, cin, k)
    b = torch.randn(cout)
    x = torch.randn(2, cin, T)

    k_eff = (k - 1) * d + 1
    padding_total = k_eff - s
    n_frames = (T - k_eff + padding_total) / s + 1
    ideal = (int(np.ceil(n_frames)) - 1) * s + (k_eff - padding_total)
    extra = ideal - T
    if causal:
        xp = ref_pad1d(x, (padding_total, extra), mode="reflect")
    else:
        pr = padding_total // 2
        pl = padding_total - pr
        xp = ref_pad1d(x, (pl, pr + extra), mode="reflect")
    want = F.conv1d(xp, w, b, stride=s, dilation=d)

    m = SConv1d(cin, cout, k, stride=s, dilation=d, causal=causal, norm="none")
    params = {"params": {"weight": t2j(w), "bias": t2j(b)}}
    got = m.apply(params, nct_to_ntc(x))
    assert_close(got, want)
    assert get_extra_padding_for_conv1d(T, k_eff, s, padding_total) == extra


def test_weight_norm_matches_torch():
    torch.manual_seed(1)
    conv = torch.nn.Conv1d(8, 16, 7)
    wn = torch.nn.utils.weight_norm(conv)
    x = torch.randn(2, 8, 30)
    want = wn(x)

    g = t2j(wn.weight_g)
    v = t2j(wn.weight_v)
    w = apply_weight_norm(v, g)
    np.testing.assert_allclose(np.asarray(w), wn.weight.detach().numpy(), rtol=1e-6, atol=1e-6)

    m = Conv1d(8, 16, 7, weight_norm=True)
    params = {"params": {"weight_v": v, "weight_g": g, "bias": t2j(wn.bias)}}
    got = m.apply(params, nct_to_ntc(x))
    assert_close(got, want)


def test_weight_norm_init_matches_torch_decomposition():
    """Fresh init: g should equal ||v|| so w == v."""
    m = Conv1d(4, 8, 5, weight_norm=True)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 4)))
    v = variables["params"]["weight_v"]
    g = variables["params"]["weight_g"]
    w = apply_weight_norm(v, g)
    np.testing.assert_allclose(np.asarray(w), np.asarray(v), rtol=1e-6)


@pytest.mark.parametrize(
    "k,s,causal,ratio,T",
    [
        (4, 2, True, 1.0, 25),
        (10, 5, True, 1.0, 16),
        (12, 6, True, 1.0, 9),
        (12, 6, True, 0.5, 9),
        (10, 5, False, 1.0, 16),
    ],
)
def test_sconvtranspose1d_matches_torch(k, s, causal, ratio, T):
    torch.manual_seed(2)
    cin, cout = 6, 4
    w = torch.randn(cin, cout, k)
    b = torch.randn(cout)
    x = torch.randn(2, cin, T)

    y = F.conv_transpose1d(x, w, b, stride=s)
    padding_total = k - s
    if causal:
        pr = int(np.ceil(padding_total * ratio))
        pl = padding_total - pr
    else:
        pr = padding_total // 2
        pl = padding_total - pr
    want = y[..., pl : y.shape[-1] - pr]

    m = SConvTranspose1d(cin, cout, k, stride=s, causal=causal, trim_right_ratio=ratio, norm="none")
    params = {"params": {"weight": t2j(w), "bias": t2j(b)}}
    got = m.apply(params, nct_to_ntc(x))
    assert_close(got, want)


def test_plain_convtranspose_matches_torch():
    torch.manual_seed(3)
    w = torch.randn(5, 7, 8)
    b = torch.randn(7)
    x = torch.randn(3, 5, 11)
    want = F.conv_transpose1d(x, w, b, stride=3)
    m = ConvTranspose1d(5, 7, 8, stride=3)
    got = m.apply({"params": {"weight": t2j(w), "bias": t2j(b)}}, nct_to_ntc(x))
    assert_close(got, want)


def test_conv1d_grouped_and_dilated():
    torch.manual_seed(4)
    w = torch.randn(8, 2, 5)  # groups=2: (O, I/g, K)
    b = torch.randn(8)
    x = torch.randn(2, 4, 40)
    want = F.conv1d(x, w, b, stride=2, padding=4, dilation=2, groups=2)
    m = Conv1d(4, 8, 5, stride=2, dilation=2, groups=2, padding=4)
    got = m.apply({"params": {"weight": t2j(w), "bias": t2j(b)}}, nct_to_ntc(x))
    assert_close(got, want)


def test_unpad1d():
    x = jnp.arange(24, dtype=jnp.float32).reshape(1, 12, 2)
    y = unpad1d(x, (3, 4))
    assert y.shape == (1, 5, 2)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x[:, 3:8]))
