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

import importlib.machinery
import math
import sys
import types

import torch


def _module(name: str) -> types.ModuleType:
    """A stub module WITH a ModuleSpec: third-party code probing for
    optional deps via `importlib.util.find_spec` (e.g. transformers'
    import_utils) raises `ValueError: <name>.__spec__ is None` on a bare
    ModuleType — which broke any test importing transformers after the
    stubs were installed by another test module's collection."""
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return m


def _install_audiotools():
    at = _module("audiotools")

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

        def resample(self, new_rate):
            """julius.resample_frac, reimplemented in torch: per-phase
            rolloff-sinc kernels with cos^2 windows normalized to unit sum,
            replicate pad (width, width + old), strided conv, floor-trim —
            the algorithm audiotools delegates to (julius is not installed
            here; this is the published algorithm, used as the golden for
            facodec_tpu/ops/resample.py)."""
            if new_rate == self.sample_rate:
                return self
            old, new = self.sample_rate, new_rate
            g = math.gcd(int(old), int(new))
            old, new = int(old) // g, int(new) // g
            zeros, rolloff = 24, 0.945
            sr = rolloff * min(old, new)
            width = math.ceil(zeros * old / sr)
            idx = torch.arange(-width, width + old, dtype=torch.float64)
            kernels = []
            for i in range(new):
                t = (-i / new + idx / old) * sr
                t = t.clamp(-zeros, zeros) * math.pi
                window = torch.cos(t / zeros / 2) ** 2
                kernel = torch.where(
                    t == 0, torch.tensor(1.0, dtype=t.dtype), torch.sin(t) / t
                ) * window
                kernels.append(kernel / kernel.sum())
            weight = torch.stack(kernels).to(torch.float32)[:, None]
            x = self.audio_data
            B, C, T = x.shape
            xf = x.reshape(-1, 1, T)
            xf = torch.nn.functional.pad(xf, (width, width + old), mode="replicate")
            ys = torch.nn.functional.conv1d(xf, weight, stride=old)
            y = ys.transpose(1, 2).reshape(B, C, -1)
            self.audio_data = y[..., : int(new * T / old)]
            self.sample_rate = new_rate
            return self

        def stft(self, window_length=None, hop_length=None, window_type=None,
                 match_stride=None):
            p = self.stft_params or STFTParams()
            wl = window_length or p.window_length
            hl = hop_length or p.hop_length
            ms = p.match_stride if match_stride is None else match_stride
            x = self.audio_data
            B, C, T = x.shape
            if ms:
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
            if ms:
                s = s[..., 2:-2]
            self.stft_data = s
            return s

        @property
        def magnitude(self):
            return torch.abs(self.stft_data)

        @staticmethod
        def get_mel_filters(sr, n_fft, n_mels, fmin=0.0, fmax=None):
            """librosa.filters.mel (htk=False, norm='slaney') in numpy."""
            import numpy as np

            if fmax is None:
                fmax = sr / 2.0

            def hz_to_mel(f):
                f = np.asarray(f, dtype=np.float64)
                mel = 3.0 * f / 200.0
                logstep = math.log(6.4) / 27.0
                return np.where(
                    f >= 1000.0,
                    15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / logstep,
                    mel,
                )

            def mel_to_hz(m):
                m = np.asarray(m, dtype=np.float64)
                logstep = math.log(6.4) / 27.0
                return np.where(
                    m >= 15.0, 1000.0 * np.exp(logstep * (m - 15.0)), 200.0 * m / 3.0
                )

            n_freqs = 1 + n_fft // 2
            fftfreqs = np.linspace(0.0, sr / 2.0, n_freqs)
            mel_f = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
            fdiff = np.diff(mel_f)
            ramps = mel_f[:, None] - fftfreqs[None, :]
            lower = -ramps[:-2] / fdiff[:-1, None]
            upper = ramps[2:] / fdiff[1:, None]
            weights = np.maximum(0.0, np.minimum(lower, upper))
            enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
            weights *= enorm[:, None]
            return weights.astype(np.float32)

        def mel_spectrogram(self, n_mels, mel_fmin=0.0, mel_fmax=None,
                            window_length=None, hop_length=None, window_type=None):
            s = self.stft(window_length, hop_length, window_type)
            magnitude = torch.abs(s)  # (B, C, F, T)
            nf = magnitude.shape[2]
            fb = torch.from_numpy(
                self.get_mel_filters(self.sample_rate, 2 * (nf - 1), n_mels,
                                     mel_fmin, mel_fmax)
            )
            # (B, C, T, M); the losses reduce elementwise so layout is
            # irrelevant as long as the *values* match audiotools'.
            return magnitude.transpose(2, -1) @ fb.T

        def clone(self):
            return _AudioSignalCopy(self)


    class _AudioSignalCopy(AudioSignal):
        def __init__(self, other):
            self.audio_data = other.audio_data.clone()
            self.sample_rate = other.sample_rate
            self.stft_params = other.stft_params

    class STFTParams:
        def __init__(self, window_length=None, hop_length=None, match_stride=None,
                     window_type=None, padding_type=None):
            self.window_length = window_length
            self.hop_length = hop_length
            self.match_stride = match_stride
            self.window_type = window_type
            self.padding_type = padding_type

    ml = _module("audiotools.ml")

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
    ab = _module("argbind")

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
    ta = _module("torchaudio")
    transforms = _module("torchaudio.transforms")
    functional = _module("torchaudio.functional")
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
    mu = _module("munch")

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
