"""Model-level golden parity vs the PyTorch reference (random-init weights
converted through facodec_tpu.utils.checkpoint).

Each test: build the torch reference module, convert its state_dict with the
real checkpoint converter, run both implementations on the same input, and
compare. This simultaneously pins the numerical semantics of every layer AND
exercises the converter's key mapping end-to-end (SURVEY.md §7 hard part #1).
"""

import numpy as np
import pytest
import torch

torch.manual_seed(0)

from ref_stubs import install_reference

install_reference()

import jax
import jax.numpy as jnp

from facodec_tpu.utils.checkpoint import convert_state_dict

TOL = dict(rtol=2e-4, atol=2e-4)


def t2j(x):
    return jnp.asarray(x.detach().numpy())


def nct(x):  # jax NTC -> numpy NCT
    return np.transpose(np.asarray(x), (0, 2, 1))


def convert(mod):
    return {"params": convert_state_dict(mod.state_dict())}


# --------------------------------------------------------------------- DAC


def test_encoder_parity():
    from dac.model.dac import Encoder as TEncoder
    from facodec_tpu.models.dac import Encoder

    ref = TEncoder(d_model=16, strides=[2, 4], d_latent=32, causal=True, lstm=2).eval()
    x = torch.randn(2, 1, 80)
    with torch.no_grad():
        want = ref(x)

    mod = Encoder(d_model=16, strides=(2, 4), d_latent=32, causal=True, lstm=2)
    got = jax.jit(mod.apply)(convert(ref), t2j(x).transpose(0, 2, 1))
    np.testing.assert_allclose(nct(got), want.numpy(), **TOL)


@pytest.mark.parametrize("causal", [True, False])
def test_decoder_parity(causal):
    from dac.model.dac import Decoder as TDecoder
    from facodec_tpu.models.dac import Decoder

    ref = TDecoder(input_channel=32, channels=64, rates=[4, 2], causal=causal, lstm=2).eval()
    x = torch.randn(2, 32, 10)
    with torch.no_grad():
        want = ref(x)

    mod = Decoder(input_channel=32, channels=64, rates=(4, 2), causal=causal, lstm=2)
    got = jax.jit(mod.apply)(convert(ref), t2j(x).transpose(0, 2, 1))
    np.testing.assert_allclose(nct(got), want.numpy(), **TOL)


# --------------------------------------------------------------- quantizers


def test_rvq_parity_eval():
    from dac.nn.quantize import ResidualVectorQuantize as TRVQ
    from facodec_tpu.models.quantize import ResidualVectorQuantize

    ref = TRVQ(input_dim=64, n_codebooks=3, codebook_size=32, codebook_dim=4).eval()
    x = torch.randn(2, 64, 12)
    with torch.no_grad():
        zq, codes, latents, commit, cb = ref(x, n_quantizers=2)

    mod = ResidualVectorQuantize(input_dim=64, n_codebooks=3, codebook_size=32, codebook_dim=4)
    params = convert(ref)
    got_zq, got_codes, got_lat, got_commit, got_cb = jax.jit(
        mod.apply, static_argnums=(2,)
    )(params, t2j(x).transpose(0, 2, 1), 2)

    np.testing.assert_array_equal(np.asarray(got_codes), codes.numpy())
    np.testing.assert_allclose(nct(got_zq), zq.numpy(), **TOL)
    np.testing.assert_allclose(nct(got_lat), latents.numpy(), **TOL)
    np.testing.assert_allclose(float(got_commit), float(commit), rtol=1e-4)
    np.testing.assert_allclose(float(got_cb), float(cb), rtol=1e-4)

    # from_codes decode path
    with torch.no_grad():
        want_z, want_zp, _ = ref.from_codes(codes)
    got_z, got_zp, _ = mod.apply(params, jnp.asarray(codes.numpy()), method=mod.from_codes)
    np.testing.assert_allclose(nct(got_z), want_z.numpy(), **TOL)
    np.testing.assert_allclose(nct(got_zp), want_zp.numpy(), **TOL)


# ------------------------------------------------------------------ wavenet


@pytest.mark.parametrize("gin", [0, 16])
def test_wn_parity(gin):
    from modules.wavenet import WN as TWN
    from facodec_tpu.models.wavenet import WN

    ref = TWN(hidden_channels=32, kernel_size=5, dilation_rate=1, n_layers=4,
              gin_channels=gin, p_dropout=0.0, causal=True).eval()
    x = torch.randn(2, 32, 20)
    mask = torch.ones(2, 1, 20)
    g = torch.randn(2, 16, 1) if gin else None
    with torch.no_grad():
        want = ref(x, mask, g=g)

    mod = WN(hidden_channels=32, kernel_size=5, dilation_rate=1, n_layers=4,
             gin_channels=gin, p_dropout=0.0, causal=True)
    gj = t2j(g).transpose(0, 2, 1) if gin else None
    got = jax.jit(mod.apply)(convert(ref), t2j(x).transpose(0, 2, 1),
                             jnp.ones((2, 20, 1)), gj)
    np.testing.assert_allclose(nct(got), want.numpy(), **TOL)


# ------------------------------------------------------------ style encoder


def test_style_encoder_parity():
    from modules.style_encoder import StyleEncoder as TSE
    from facodec_tpu.models.style_encoder import StyleEncoder

    ref = TSE(in_dim=80, hidden_dim=64, out_dim=32).eval()
    x = torch.randn(2, 80, 24)
    mask = torch.zeros(2, 1, 24)
    mask[0, :, :24] = 1
    mask[1, :, :15] = 1
    with torch.no_grad():
        want = ref(x, mask)

    mod = StyleEncoder(in_dim=80, hidden_dim=64, out_dim=32)
    got = jax.jit(mod.apply)(
        convert(ref), t2j(x).transpose(0, 2, 1), t2j(mask).transpose(0, 2, 1)
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), **TOL)


# ----------------------------------------------------------------- CNNLSTM


def test_cnnlstm_parity():
    from modules.quantize import CNNLSTM as TCNNLSTM
    from facodec_tpu.models.fa_quantizer import CNNLSTM

    ref = TCNNLSTM(indim=32, outdim=8, head=2).eval()
    x = torch.randn(2, 32, 16)
    with torch.no_grad():
        want = ref(x)

    mod = CNNLSTM(indim=32, outdim=8, head=2)
    got = jax.jit(mod.apply)(convert(ref), t2j(x).transpose(0, 2, 1))
    assert len(got) == len(want) == 2
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w.numpy(), **TOL)


def test_cnnlstm_global_parity():
    from modules.quantize import CNNLSTM as TCNNLSTM
    from facodec_tpu.models.fa_quantizer import CNNLSTM

    ref = TCNNLSTM(indim=32, outdim=8, head=1, global_pred=True).eval()
    x = torch.randn(2, 32, 16)
    with torch.no_grad():
        want = ref(x)

    mod = CNNLSTM(indim=32, outdim=8, head=1, global_pred=True)
    got = jax.jit(mod.apply)(convert(ref), t2j(x).transpose(0, 2, 1))
    np.testing.assert_allclose(np.asarray(got[0]), want[0].numpy(), **TOL)


# -------------------------------------------------------------- mel parity


def test_log_mel_matches_reference_preprocess():
    """Our XLA mel == the reference FAquantizer.preprocess (torchaudio mel)."""
    from modules.quantize import FAquantizer as TFA
    from facodec_tpu.ops.spectral import log_mel_spectrogram

    torch.manual_seed(3)
    ref = TFA(in_dim=64, n_p_codebooks=1, n_c_codebooks=1, n_t_codebooks=1,
              n_r_codebooks=1, codebook_size=16, codebook_dim=4,
              causal=True, separate_prosody_encoder=False, timbre_norm=True).eval()
    wave = torch.randn(2, 1, 3000)
    with torch.no_grad():
        want = ref.preprocess(wave, n_bins=80)  # (B, 80, T')

    got = log_mel_spectrogram(t2j(wave[:, 0]), sample_rate=24000, hop_length=300)
    got = got[:, : wave.shape[-1] // 300, :]  # (B, T', 80)
    np.testing.assert_allclose(
        nct(got), want.numpy(), rtol=5e-3, atol=5e-3
    )


# ------------------------------------------------------------- FAquantizer


def test_faquantizer_forward_v2_parity():
    from modules.quantize import FAquantizer as TFA
    from facodec_tpu.models.fa_quantizer import FAquantizer

    torch.manual_seed(4)
    ref = TFA(in_dim=1024, n_p_codebooks=1, n_c_codebooks=2, n_t_codebooks=2,
              n_r_codebooks=3, codebook_size=1024, codebook_dim=8,
              quantizer_dropout=0.5, causal=True,
              separate_prosody_encoder=True, timbre_norm=True).eval()

    B, frames = 2, 4
    x = torch.randn(B, 1024, frames)
    wave = 0.5 * torch.randn(B, 1, frames * 300)
    with torch.no_grad():
        outs, quantized, commit, cb, timbre, codes = ref(
            x, wave, n_c=2, full_waves=None, wave_lens=None, return_codes=True
        )

    mod = FAquantizer(in_dim=1024, n_p_codebooks=1, n_c_codebooks=2,
                      n_t_codebooks=2, n_r_codebooks=3, codebook_size=1024,
                      codebook_dim=8, quantizer_dropout=0.5, causal=True,
                      separate_prosody_encoder=True, timbre_norm=True)
    got = mod.apply(
        convert(ref), t2j(x).transpose(0, 2, 1), t2j(wave[:, 0]),
        n_c=2, return_codes=True,
    )
    got_outs, got_q, got_commit, got_cb, got_timbre, got_codes = got

    for gc, wc in zip(got_codes, codes):
        np.testing.assert_array_equal(np.asarray(gc), wc.numpy())
    np.testing.assert_allclose(np.asarray(got_timbre), timbre.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(nct(got_outs), outs.numpy(), rtol=5e-3, atol=5e-3)
    for gq, wq in zip(got_q, quantized):
        np.testing.assert_allclose(nct(gq), wq.numpy(), rtol=2e-3, atol=2e-3)
    # measured rel error ~1e-7 (same reduction order as torch); 1e-5 guards
    # against platform-level accumulation differences only
    np.testing.assert_allclose(float(got_commit), float(commit), rtol=1e-5)
    np.testing.assert_allclose(float(got_cb), float(cb), rtol=1e-5)


# ------------------------------------------------------------- FApredictors


def test_fa_predictors_parity():
    from modules.quantize import FApredictors as TFP
    from facodec_tpu.models.fa_quantizer import FApredictors

    torch.manual_seed(5)
    kw = dict(in_dim=64, use_gr_content_f0=False, use_gr_prosody_phone=False,
              use_gr_residual_f0=True, use_gr_residual_phone=True,
              use_gr_timbre_content=True, use_gr_timbre_prosody=False,
              use_gr_x_timbre=True, norm_f0=True, timbre_norm=True,
              use_gr_content_global_f0=True)
    ref = TFP(**kw).eval()
    # torch CNNLSTMs are sized by in_dim=1024 default? no: uses in_dim
    q = [torch.randn(2, 64, 12) for _ in range(3)]
    timbre = torch.randn(2, 64)
    with torch.no_grad():
        preds, rev_preds = ref(q, timbre)

    mod = FApredictors(**kw)
    qj = [t2j(t).transpose(0, 2, 1) for t in q]
    got_preds, got_rev = mod.apply(convert(ref), qj, t2j(timbre))

    def chk(g, w):
        g = np.asarray(g)
        w = w.detach().numpy()
        if g.ndim == 3 and w.ndim == 3 and g.shape != w.shape:
            g = np.transpose(g, (0, 2, 1))
        np.testing.assert_allclose(g, w, **TOL)

    chk(got_preds["f0"], preds["f0"])
    chk(got_preds["uv"], preds["uv"])
    chk(got_preds["content"], preds["content"])
    chk(got_preds["timbre"], preds["timbre"])
    chk(got_rev["rev_f0"], rev_preds["rev_f0"])
    chk(got_rev["rev_uv"], rev_preds["rev_uv"])
    chk(got_rev["rev_content"], rev_preds["rev_content"])
    chk(got_rev["x_timbre"], rev_preds["x_timbre"])


# ---------------------------------------------------------------- redecoder


def test_redecoder_parity():
    from modules.redecoder import Redecoder as TRedecoder
    from munch import Munch
    from facodec_tpu.models.redecoder import Redecoder

    torch.manual_seed(6)
    args = Munch(n_p_codebooks=1, n_c_codebooks=2, encoder_type="wavenet",
                 wavenet_embed_dim=64, decoder_causal=False)
    ref = TRedecoder(args).eval()
    p_code = torch.randint(0, 1024, (2, 1, 12))
    c_code = torch.randint(0, 1024, (2, 2, 12))
    timbre = torch.randn(2, 1024)
    with torch.no_grad():
        want = ref(p_code, c_code, timbre, use_p_code=False, n_c=1)

    mod = Redecoder(n_p_codebooks=1, n_c_codebooks=2, embed_dim=64,
                    n_layers=16, causal=False)
    got = mod.apply(convert(ref), jnp.asarray(p_code.numpy()),
                    jnp.asarray(c_code.numpy()), t2j(timbre),
                    use_p_code=False, n_c=1)
    np.testing.assert_allclose(nct(got), want.numpy(), **TOL)


# ------------------------------------------------------------ discriminator


def test_discriminator_parity():
    from dac.model.discriminator import Discriminator as TD
    from facodec_tpu.models.discriminator import Discriminator

    torch.manual_seed(7)
    bands = [(0.0, 0.1), (0.1, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0)]
    ref = TD(rates=[], periods=[2, 3], fft_sizes=[512], sample_rate=24000,
             bands=bands).eval()
    x = torch.randn(2, 1, 4096)
    with torch.no_grad():
        want = ref(x)

    mod = Discriminator(rates=(), periods=(2, 3), fft_sizes=(512,),
                        sample_rate=24000, bands=tuple(bands))
    got = jax.jit(mod.apply)(convert(ref), t2j(x).transpose(0, 2, 1))

    assert len(got) == len(want)
    for gd, wd in zip(got, want):
        assert len(gd) == len(wd)
        for g, w in zip(gd, wd):
            g = np.asarray(g)
            wnp = w.numpy()
            if g.ndim == 4:  # NHWC -> NCHW
                g = np.transpose(g, (0, 3, 1, 2))
            elif g.ndim == 3:
                g = np.transpose(g, (0, 2, 1))
            np.testing.assert_allclose(g, wnp, rtol=1e-3, atol=1e-3)


def test_export_roundtrip():
    """flax -> torch export is the exact inverse of conversion: a converted
    state_dict exported back reproduces the torch weights bit-for-bit."""
    from dac.model.dac import Encoder as TEncoder
    from facodec_tpu.utils.checkpoint import export_state_dict

    ref = TEncoder(d_model=16, strides=[2, 4], d_latent=32, causal=True, lstm=1)
    sd = ref.state_dict()
    params = convert_state_dict(sd)
    back = export_state_dict(params, list(sd.keys()))
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k].numpy())


def test_faquantizer_forward_v2_full_waves_parity():
    """The training-time timbre path: full padded waves + sequence-mask
    pooling (reference quantize.py:378-382)."""
    from modules.quantize import FAquantizer as TFA
    from facodec_tpu.models.fa_quantizer import FAquantizer

    torch.manual_seed(8)
    # in_dim must be 1024: the reference hard-codes timbre_linear at 1024
    kw = dict(in_dim=1024, n_p_codebooks=1, n_c_codebooks=2, n_t_codebooks=2,
              n_r_codebooks=3, codebook_size=32, codebook_dim=4,
              quantizer_dropout=0.5, causal=True,
              separate_prosody_encoder=False, timbre_norm=True)
    ref = TFA(**kw).eval()
    mod = FAquantizer(**kw)

    B, frames = 2, 2
    x = torch.randn(B, 1024, frames)
    wave = 0.4 * torch.randn(B, 1, frames * 300)
    full = torch.zeros(B, 3000)
    full[0] = 0.4 * torch.randn(3000)
    full[1, :1800] = 0.4 * torch.randn(1800)  # shorter utterance, zero-padded
    lens = torch.tensor([3000, 1800])
    with torch.no_grad():
        outs, q, commit, cb, timbre = ref(x, wave, n_c=2,
                                          full_waves=full.unsqueeze(1),
                                          wave_lens=lens)

    got = mod.apply(
        convert(ref), t2j(x).transpose(0, 2, 1), t2j(wave[:, 0]),
        n_c=2, full_waves=t2j(full), wave_lens=jnp.asarray(lens.numpy()),
    )
    got_outs, got_q, got_commit, got_cb, got_timbre = got
    np.testing.assert_allclose(np.asarray(got_timbre), timbre.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(nct(got_outs), outs.numpy(), rtol=5e-3, atol=5e-3)
