"""Golden parity for the legacy 4-stream (timbre_norm=False) FAquantizer
paths: forward (v1), encode, decode — and the MSD discriminator at rate 1.

The v1 forward keeps its random residual mask even in eval (reference
quantize.py:348-366 draws from numpy RNG unconditionally); parity is tested
with noise_added/recon_noisy flags set so the mask is forced deterministic.
"""

import numpy as np
import pytest
import torch

from ref_stubs import install_reference

install_reference()

import jax
import jax.numpy as jnp

from facodec_tpu.models.fa_quantizer import FAquantizer
from facodec_tpu.utils.checkpoint import convert_state_dict


def _pair(seed=0):
    torch.manual_seed(seed)
    from modules.quantize import FAquantizer as TFA

    # separate_prosody_encoder=False: the reference hard-codes its prosody
    # encoder output at 1024 channels, so it cannot itself run the separate-
    # encoder variant at reduced in_dim; the v1 stream logic is fully
    # exercised without it (prosody RVQ on x directly, quantize.py:325-328)
    kw = dict(in_dim=64, n_p_codebooks=1, n_c_codebooks=2, n_t_codebooks=2,
              n_r_codebooks=3, codebook_size=32, codebook_dim=4,
              quantizer_dropout=0.5, causal=True,
              separate_prosody_encoder=False, timbre_norm=False)
    ref = TFA(**kw).eval()
    mod = FAquantizer(**kw)
    params = {"params": convert_state_dict(ref.state_dict())}
    return ref, mod, params


def test_forward_v1_parity():
    ref, mod, params = _pair(0)
    B, frames = 2, 4
    x = torch.randn(B, 64, frames)
    wave = 0.5 * torch.randn(B, 1, frames * 300)
    flags = torch.ones(B, dtype=torch.bool)
    with torch.no_grad():
        outs, quantized, commit, cb = ref(x, wave, flags, flags, n_c=2, n_t=2)

    got = mod.apply(
        params, jnp.asarray(x.numpy()).transpose(0, 2, 1), jnp.asarray(wave[:, 0].numpy()),
        noise_added_flags=jnp.ones(B, bool), recon_noisy_flags=jnp.ones(B, bool),
        n_c=2, n_t=2,
    )
    got_outs, got_q, got_commit, got_cb = got
    np.testing.assert_allclose(
        np.transpose(np.asarray(got_outs), (0, 2, 1)), outs.numpy(),
        rtol=5e-3, atol=5e-3,
    )
    for gq, wq in zip(got_q, quantized):
        np.testing.assert_allclose(
            np.transpose(np.asarray(gq), (0, 2, 1)), wq.numpy(), rtol=2e-3, atol=2e-3
        )
    # same reduction order as torch; measured rel error ~1e-7 (see the
    # matching tolerance note in test_model_parity.py)
    np.testing.assert_allclose(float(got_commit), float(commit), rtol=1e-5)
    np.testing.assert_allclose(float(got_cb), float(cb), rtol=1e-5)


def test_encode_decode_v1_parity():
    ref, mod, params = _pair(1)
    B, frames = 2, 4
    x = torch.randn(B, 64, frames)
    wave = 0.5 * torch.randn(B, 1, frames * 300)
    with torch.no_grad():
        codes, zs = ref.encode(x, wave, n_c=2)

    got_codes, got_zs = mod.apply(
        params, jnp.asarray(x.numpy()).transpose(0, 2, 1),
        jnp.asarray(wave[:, 0].numpy()), n_c=2, method=mod.encode,
    )
    for gc, wc in zip(got_codes, codes):
        np.testing.assert_array_equal(np.asarray(gc), wc.numpy())
    for gz, wz in zip(got_zs, zs):
        np.testing.assert_allclose(
            np.transpose(np.asarray(gz), (0, 2, 1)), wz.numpy(), rtol=2e-3, atol=2e-3
        )

    # decode path: stack [c, p, t0, t1] (reference quantize.py:244-254)
    stacked = torch.cat([codes[0][:, :1], codes[1][:, :1], codes[2][:, :2]], dim=1)
    with torch.no_grad():
        z_ref, _ = ref.decode(stacked)
    got_z, _ = mod.apply(params, jnp.asarray(stacked.numpy()), method=mod.decode)
    np.testing.assert_allclose(
        np.transpose(np.asarray(got_z), (0, 2, 1)), z_ref.numpy(), rtol=2e-3, atol=2e-3
    )


def test_msd_parity_rate1():
    from dac.model.discriminator import MSD as TMSD

    from facodec_tpu.models.discriminator import MSD

    torch.manual_seed(2)
    ref = TMSD(rate=1, sample_rate=24000).eval()
    x = torch.randn(2, 1, 4000)
    with torch.no_grad():
        want = ref(x)

    mod = MSD(rate=1, sample_rate=24000)
    got = jax.jit(mod.apply)(
        {"params": convert_state_dict(ref.state_dict())},
        jnp.asarray(x.numpy()).transpose(0, 2, 1),
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.transpose(np.asarray(g), (0, 2, 1)), w.numpy(), rtol=1e-3, atol=1e-3
        )


@pytest.mark.parametrize("rate", [2, 4])
def test_msd_parity_rate_gt1(rate):
    """MSD with julius-style downsampling (reference discriminator.py:83-84;
    julius.resample_frac reimplemented identically on both sides — the torch
    golden in ref_stubs, the JAX path in ops/resample.py)."""
    from dac.model.discriminator import MSD as TMSD

    from facodec_tpu.models.discriminator import MSD

    torch.manual_seed(3)
    ref = TMSD(rate=rate, sample_rate=24000).eval()
    x = torch.randn(2, 1, 4000)
    with torch.no_grad():
        want = ref(x)

    mod = MSD(rate=rate, sample_rate=24000)
    got = jax.jit(mod.apply)(
        {"params": convert_state_dict(ref.state_dict())},
        jnp.asarray(x.numpy()).transpose(0, 2, 1),
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g.shape[1] == w.shape[-1]
        np.testing.assert_allclose(
            np.transpose(np.asarray(g), (0, 2, 1)), w.numpy(), rtol=1e-3, atol=1e-3
        )


def test_resample_frac_preserves_constants():
    """Unit-sum kernels: a constant signal resamples to the same constant."""
    from facodec_tpu.ops.resample import resample_frac

    x = jnp.full((1, 4001), 0.7, jnp.float32)
    for old, new in ((24000, 12000), (24000, 6000), (2, 3), (16000, 24000)):
        y = resample_frac(x, old, new)
        assert y.shape[-1] == int((new // np.gcd(old, new)) * 4001 / (old // np.gcd(old, new)))
        np.testing.assert_allclose(np.asarray(y), 0.7, rtol=2e-5)
