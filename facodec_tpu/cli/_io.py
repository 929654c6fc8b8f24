"""Shared CLI helpers: wav IO and model loading."""

from __future__ import annotations

import os

import numpy as np

from facodec_tpu.train.data import load_wav  # scipy-backed reader


def save_wav(path: str, wave: np.ndarray, sr: int = 24000) -> None:
    from scipy.io import wavfile

    wave = np.asarray(wave)
    if wave.ndim == 2:
        wave = wave[0]
    wave = np.clip(wave, -1.0, 1.0)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    wavfile.write(path, sr, (wave * 32767.0).astype(np.int16))


DEFAULT_CONFIG = os.environ.get(
    "FACODEC_CONFIG", "/root/reference/configs/config.yml"
)
DEFAULT_REDECODER_CONFIG = os.environ.get(
    "FACODEC_REDECODER_CONFIG", "/root/reference/configs/config_redecoder.yml"
)
