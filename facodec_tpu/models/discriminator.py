"""GAN discriminator ensemble: multi-period (MPD), multi-resolution complex
spectrogram (MRD), and multi-scale (MSD) discriminators.

TPU-native rebuild of /root/reference/dac/model/discriminator.py:27-217.
Layouts: waves (B, T, 1); 2-D conv activations NHWC. In the released FAcodec
configuration MSD is disabled (rates=[], modules/commons.py:334-340).

The MRD front-end reproduces audiotools' `match_stride` STFT behavior:
reflect-pad by ((win-hop)/2, (win-hop)/2 + right_pad) so frames align to hop
multiples, run a centered STFT, then drop two frames on each side.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from facodec_tpu.nn.conv import Conv1d, Conv2d
from facodec_tpu.ops.spectral import stft

BANDS = ((0.0, 0.1), (0.1, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0))


def _leaky(x):
    return nn.leaky_relu(x, 0.1)


class MPD(nn.Module):
    """Period discriminator: fold the wave into (T/p, p) and run 2-D convs
    (reference discriminator.py:27-62)."""

    period: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        # x: (B, T, 1) -> pad to period multiple -> (B, T/p, p, 1)
        B, T, _ = x.shape
        pad = self.period - T % self.period
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="reflect")
        x = x.reshape(B, -1, self.period, 1)

        fmap = []
        chans = [(1, 32), (32, 128), (128, 512), (512, 1024)]
        for i, (cin, cout) in enumerate(chans):
            x = Conv2d(cin, cout, (5, 1), stride=(3, 1), padding=(2, 0),
                       weight_norm=True, name=f"convs_{i}_0")(x)
            x = _leaky(x)
            fmap.append(x)
        x = Conv2d(1024, 1024, (5, 1), stride=(1, 1), padding=(2, 0),
                   weight_norm=True, name="convs_4_0")(x)
        x = _leaky(x)
        fmap.append(x)
        x = Conv2d(1024, 1, (3, 1), padding=(1, 0), weight_norm=True,
                   name="conv_post")(x)
        fmap.append(x)
        return fmap


class MRD(nn.Module):
    """Complex multi-band spectrogram discriminator
    (reference discriminator.py:101-172)."""

    window_length: int
    hop_factor: float = 0.25
    sample_rate: int = 44100
    bands: Sequence[Tuple[float, float]] = BANDS

    def _spectrogram(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        """(B, T, 1) -> list of (B, frames, band_bins, 2) real/imag stacks,
        reproducing audiotools AudioSignal.stft with match_stride=True."""
        w = self.window_length
        hop = int(w * self.hop_factor)
        wave = x[:, :, 0]
        T = wave.shape[-1]
        right_pad = math.ceil(T / hop) * hop - T
        pad = (w - hop) // 2
        wave = jnp.pad(wave, ((0, 0), (pad, pad + right_pad)), mode="reflect")
        z = stft(wave, n_fft=w, hop_length=hop, win_length=w)  # (B, F_t, F)
        z = z[:, 2:-2]  # match_stride drops 2 frames each side
        spec = jnp.stack([z.real, z.imag], axis=-1)  # (B, frames, F, 2)
        n_fft_bins = w // 2 + 1
        out = []
        for lo, hi in self.bands:
            out.append(spec[:, :, int(lo * n_fft_bins) : int(hi * n_fft_bins), :])
        return out

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        x_bands = self._spectrogram(x)
        fmap = []
        outs = []
        ch = 32
        shapes = [
            (2, ch, (1, 1)),
            (ch, ch, (1, 2)),
            (ch, ch, (1, 2)),
            (ch, ch, (1, 2)),
        ]
        for b, band in enumerate(x_bands):
            h = band
            for i, (cin, cout, stride) in enumerate(shapes):
                h = Conv2d(cin, cout, (3, 9), stride=stride, padding=(1, 4),
                           weight_norm=True, name=f"band_convs_{b}_{i}_0")(h)
                h = _leaky(h)
                fmap.append(h)
            h = Conv2d(ch, ch, (3, 3), padding=(1, 1), weight_norm=True,
                       name=f"band_convs_{b}_4_0")(h)
            h = _leaky(h)
            fmap.append(h)
            outs.append(h)
        h = jnp.concatenate(outs, axis=-2)  # concat along frequency
        h = Conv2d(ch, 1, (3, 3), padding=(1, 1), weight_norm=True,
                   name="conv_post")(h)
        fmap.append(h)
        return fmap


class MSD(nn.Module):
    """Multi-scale waveform discriminator (reference discriminator.py:65-95).
    Disabled (rates=[]) in the released FAcodec config; provided for
    completeness. rate > 1 downsamples through the julius-exact fractional
    sinc resampler (ops/resample.py), matching audiotools'
    AudioSignal.resample (reference discriminator.py:83-84)."""

    rate: int = 1
    sample_rate: int = 44100

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        if self.rate > 1:
            from facodec_tpu.ops.resample import resample_frac

            x = resample_frac(
                x[:, :, 0], self.sample_rate, self.sample_rate // self.rate
            )[:, :, None]
        fmap = []
        specs = [
            (1, 16, 15, 1, 1, 7),
            (16, 64, 41, 4, 4, 20),
            (64, 256, 41, 4, 16, 20),
            (256, 1024, 41, 4, 64, 20),
            (1024, 1024, 41, 4, 256, 20),
            (1024, 1024, 5, 1, 1, 2),
        ]
        for i, (cin, cout, k, s, g, p) in enumerate(specs):
            x = Conv1d(cin, cout, k, stride=s, groups=g, padding=p,
                       weight_norm=True, name=f"convs_{i}_0")(x)
            x = _leaky(x)
            fmap.append(x)
        x = Conv1d(1024, 1, 3, padding=1, weight_norm=True, name="conv_post")(x)
        fmap.append(x)
        return fmap


class Discriminator(nn.Module):
    """Ensemble discriminator (reference discriminator.py:175-217).
    Input wave (B, T, 1); returns a list of per-discriminator fmap lists."""

    rates: Sequence[int] = ()
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    fft_sizes: Sequence[int] = (2048, 1024, 512)
    sample_rate: int = 44100
    bands: Sequence[Tuple[float, float]] = BANDS

    def preprocess(self, y: jnp.ndarray) -> jnp.ndarray:
        # remove DC offset, peak-normalize to 0.8 (reference :207-212)
        y = y - jnp.mean(y, axis=1, keepdims=True)
        peak = jnp.max(jnp.abs(y), axis=1, keepdims=True)
        return 0.8 * y / (peak + 1e-9)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[List[jnp.ndarray]]:
        x = self.preprocess(x)
        results = []
        idx = 0
        for p in self.periods:
            results.append(MPD(p, name=f"discriminators_{idx}")(x))
            idx += 1
        for r in self.rates:
            results.append(
                MSD(r, sample_rate=self.sample_rate, name=f"discriminators_{idx}")(x)
            )
            idx += 1
        for f in self.fft_sizes:
            results.append(
                MRD(f, sample_rate=self.sample_rate, bands=tuple(self.bands),
                    name=f"discriminators_{idx}")(x)
            )
            idx += 1
        return results
