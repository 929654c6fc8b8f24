"""Import the PyTorch reference (/root/reference) for golden-parity tests.

The reference depends on `audiotools`, `argbind`, and `torchaudio`, none of
which are installed here. This module installs minimal stand-ins in
sys.modules *before* adding /root/reference to sys.path:

  * audiotools: AudioSignal/STFTParams/ml.BaseModel shells — only referenced
    at import time by modules we don't exercise in the golden tests.
  * argbind: no-op `bind` decorator.
  * torchaudio: a pure-torch `transforms.MelSpectrogram` reproducing
    torchaudio's exact semantics (center=True reflect pad, periodic hann,
    HTK mel scale, norm=None) so FAquantizer.preprocess runs identically to
    the real dependency.

Only used by tests — the framework itself never imports the reference.
"""

from __future__ import annotations

import math
import sys
import types

import torch


def _install_audiotools():
    at = types.ModuleType("audiotools")

    class AudioSignal:
        """Minimal stand-in reproducing audiotools.AudioSignal.stft semantics
        (match_stride pad -> centered torch.stft -> drop 2 frames/side)."""

        def __init__(self, audio_data, sample_rate, stft_params=None):
            if audio_data.ndim == 2:
                audio_data = audio_data.unsqueeze(1)
            self.audio_data = audio_data
            self.sample_rate = sample_rate
            self.stft_params = stft_params

        @property
        def signal_length(self):
            return self.audio_data.shape[-1]

        def stft(self):
            p = self.stft_params
            wl, hl = p.window_length, p.hop_length
            x = self.audio_data
            B, C, T = x.shape
            if p.match_stride:
                right_pad = math.ceil(T / hl) * hl - T
                pad = (wl - hl) // 2
            else:
                right_pad = pad = 0
            x = torch.nn.functional.pad(x, (pad, pad + right_pad), "reflect")
            window = torch.hann_window(wl, periodic=True)
            s = torch.stft(
                x.reshape(-1, x.shape[-1]), n_fft=wl, hop_length=hl,
                window=window, return_complex=True, center=True,
            )
            s = s.reshape(B, C, s.shape[-2], s.shape[-1])
            if p.match_stride:
                s = s[..., 2:-2]
            return s

    class STFTParams:
        def __init__(self, window_length=None, hop_length=None, match_stride=None,
                     window_type=None, padding_type=None):
            self.window_length = window_length
            self.hop_length = hop_length
            self.match_stride = match_stride
            self.window_type = window_type
            self.padding_type = padding_type

    ml = types.ModuleType("audiotools.ml")

    class BaseModel(torch.nn.Module):
        INTERN = []
        EXTERN = []

    class Accelerator:  # pragma: no cover - import-time placeholder
        pass

    ml.BaseModel = BaseModel
    ml.Accelerator = Accelerator
    at.AudioSignal = AudioSignal
    at.STFTParams = STFTParams
    at.ml = ml
    sys.modules["audiotools"] = at
    sys.modules["audiotools.ml"] = ml


def _install_argbind():
    ab = types.ModuleType("argbind")

    def bind(*a, **k):
        if len(a) == 1 and callable(a[0]) and not k:
            return a[0]
        return lambda f: f

    ab.bind = bind
    sys.modules["argbind"] = ab


class _MelSpectrogram(torch.nn.Module):
    """Pure-torch reproduction of torchaudio.transforms.MelSpectrogram
    (power=2, center=True reflect, periodic hann, HTK scale, norm=None)."""

    def __init__(self, sample_rate=16000, n_fft=400, win_length=None,
                 hop_length=None, f_min=0.0, f_max=None, n_mels=128,
                 window_fn=torch.hann_window, power=2.0, center=True,
                 pad_mode="reflect", norm=None, mel_scale="htk", **kw):
        super().__init__()
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.win_length = win_length or n_fft
        self.hop_length = hop_length or self.win_length // 2
        self.power = power
        self.center = center
        self.pad_mode = pad_mode
        window = window_fn(self.win_length)
        self.register_buffer("window", window)
        n_freqs = n_fft // 2 + 1
        f_max = f_max or sample_rate / 2.0
        fb = self._melscale_fbanks(n_freqs, f_min, f_max, n_mels, sample_rate, norm)
        self.register_buffer("fb", fb)

    @staticmethod
    def _hz_to_mel(f):
        return 2595.0 * math.log10(1.0 + f / 700.0)

    @classmethod
    def _melscale_fbanks(cls, n_freqs, f_min, f_max, n_mels, sample_rate, norm):
        all_freqs = torch.linspace(0, sample_rate // 2, n_freqs)
        m_min = cls._hz_to_mel(f_min)
        m_max = cls._hz_to_mel(f_max)
        m_pts = torch.linspace(m_min, m_max, n_mels + 2)
        f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
        f_diff = f_pts[1:] - f_pts[:-1]
        slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
        down = (-slopes[:, :-2]) / f_diff[:-1]
        up = slopes[:, 2:] / f_diff[1:]
        fb = torch.clamp(torch.min(down, up), min=0.0)
        if norm == "slaney":
            enorm = 2.0 / (f_pts[2:] - f_pts[:n_mels])
            fb *= enorm.unsqueeze(0)
        return fb

    def forward(self, x):
        spec = torch.stft(
            x, self.n_fft, self.hop_length, self.win_length, self.window,
            center=self.center, pad_mode=self.pad_mode, normalized=False,
            onesided=True, return_complex=True,
        )
        spec = spec.abs() ** self.power  # (..., F, T)
        return torch.matmul(self.fb.T, spec)  # (..., n_mels, T)


def _install_torchaudio():
    ta = types.ModuleType("torchaudio")
    transforms = types.ModuleType("torchaudio.transforms")
    functional = types.ModuleType("torchaudio.functional")
    transforms.MelSpectrogram = _MelSpectrogram

    def resample(x, orig_freq, new_freq):  # pragma: no cover
        raise NotImplementedError("torchaudio stub: resample")

    functional.resample = resample
    ta.transforms = transforms
    ta.functional = functional
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.transforms"] = transforms
    sys.modules["torchaudio.functional"] = functional


def _install_munch():
    mu = types.ModuleType("munch")

    class Munch(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    mu.Munch = Munch
    sys.modules["munch"] = mu


def install_reference():
    """Install stubs and put /root/reference on sys.path. Idempotent."""
    if "/root/reference" not in sys.path:
        if "audiotools" not in sys.modules:
            _install_audiotools()
        if "argbind" not in sys.modules:
            _install_argbind()
        if "torchaudio" not in sys.modules:
            _install_torchaudio()
        if "munch" not in sys.modules:
            _install_munch()
        sys.path.insert(0, "/root/reference")
