"""Golden parity for the loss stack vs the reference criteria.

The spectral losses run the reference's dac/nn/loss.py classes over the
audiotools-semantics stub AudioSignal (torch.stft + librosa-slaney mels) and
compare against our XLA implementations; GAN/focal/smooth-L1/log_norm compare
against the exact torch formulas.
"""

import numpy as np
import torch

from ref_stubs import install_reference

install_reference()

import jax.numpy as jnp

from facodec_tpu.losses import (
    discriminator_loss,
    focal_loss,
    generator_adv_losses,
    l1_loss,
    log_norm,
    mel_spectrogram_loss,
    multi_scale_stft_loss,
    smooth_l1_loss,
)


def _waves(seed=0, B=2, T=8192):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((B, T)) * 0.3).astype(np.float32)


def test_multi_scale_stft_loss_parity():
    from audiotools import AudioSignal
    from dac.nn.loss import MultiScaleSTFTLoss

    x, y = _waves(0), _waves(1)
    crit = MultiScaleSTFTLoss()
    want = crit(
        AudioSignal(torch.from_numpy(x), 24000),
        AudioSignal(torch.from_numpy(y), 24000),
    )
    got = multi_scale_stft_loss(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)


def test_mel_spectrogram_loss_parity():
    from audiotools import AudioSignal
    from dac.nn.loss import MelSpectrogramLoss

    x, y = _waves(2), _waves(3)
    crit = MelSpectrogramLoss(
        n_mels=[5, 10, 20, 40, 80, 160, 320],
        window_lengths=[32, 64, 128, 256, 512, 1024, 2048],
        mel_fmin=[0] * 7,
        mel_fmax=[None] * 7,
        pow=1.0,
        mag_weight=0.0,
        clamp_eps=1e-5,
    )
    want = crit(
        AudioSignal(torch.from_numpy(x), 24000),
        AudioSignal(torch.from_numpy(y), 24000),
    )
    got = mel_spectrogram_loss(jnp.asarray(x), jnp.asarray(y), sample_rate=24000)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)


def test_l1_loss_parity():
    x, y = _waves(4), _waves(5)
    want = torch.nn.functional.l1_loss(torch.from_numpy(x), torch.from_numpy(y))
    got = l1_loss(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_gan_losses_parity():
    rng = np.random.default_rng(6)
    # two discriminators, 3 fmaps each
    d_fake = [[rng.standard_normal((2, 4, 5)).astype(np.float32) for _ in range(3)]
              for _ in range(2)]
    d_real = [[rng.standard_normal((2, 4, 5)).astype(np.float32) for _ in range(3)]
              for _ in range(2)]

    # torch formulas straight from train.py:282-312
    tf = [[torch.from_numpy(a) for a in d] for d in d_fake]
    tr = [[torch.from_numpy(a) for a in d] for d in d_real]
    loss_d = sum(torch.mean(f[-1] ** 2) + torch.mean((1 - r[-1]) ** 2)
                 for f, r in zip(tf, tr))
    loss_g = sum(torch.mean((1 - f[-1]) ** 2) for f in tf)
    loss_feat = sum(
        torch.nn.functional.l1_loss(f[j], r[j])
        for f, r in zip(tf, tr) for j in range(2)
    )

    jf = [[jnp.asarray(a) for a in d] for d in d_fake]
    jr = [[jnp.asarray(a) for a in d] for d in d_real]
    got_d = discriminator_loss(jf, jr)
    got_g, got_feat = generator_adv_losses(jf, jr)
    np.testing.assert_allclose(float(got_d), float(loss_d), rtol=1e-5)
    np.testing.assert_allclose(float(got_g), float(loss_g), rtol=1e-5)
    np.testing.assert_allclose(float(got_feat), float(loss_feat), rtol=1e-5)


def test_focal_loss_parity():
    from losses import FocalLoss

    rng = np.random.default_rng(7)
    logits = rng.standard_normal((2, 10, 6)).astype(np.float32)  # (B, C, T)
    labels = rng.integers(0, 10, (2, 6))
    want = FocalLoss(gamma=2)(torch.from_numpy(logits), torch.from_numpy(labels))
    # ours takes (..., C) layout
    got = focal_loss(jnp.asarray(np.transpose(logits, (0, 2, 1))), jnp.asarray(labels), gamma=2.0)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_smooth_l1_parity():
    x, y = _waves(8, T=100), _waves(9, T=100)
    want = torch.nn.functional.smooth_l1_loss(torch.from_numpy(x), torch.from_numpy(y))
    got = smooth_l1_loss(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_log_norm_parity():
    import sys
    sys.path.insert(0, "/root/reference")
    from modules.commons import log_norm as t_log_norm

    rng = np.random.default_rng(10)
    x = rng.standard_normal((2, 80, 12)).astype(np.float32)  # torch (B, mel, T)
    want = t_log_norm(torch.from_numpy(x)[:, None], dim=2).squeeze(1)
    got = log_norm(jnp.asarray(np.transpose(x, (0, 2, 1))))  # ours (B, T, mel)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4)
