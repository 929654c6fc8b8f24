"""encode/decode CLI — the `python -m dac encode|decode` analog
(reference dac/__main__.py:12-36, dac/utils/{encode,decode}.py) producing
.fac artifacts (codes + timbre) instead of .dac files.

    python -m facodec_tpu encode --input in.wav [--output out.fac]
        [--no-normalize] [--normalize-db -16] [--streaming-threshold 30]
    python -m facodec_tpu decode --input out.fac [--output out.wav]
        [--no-residual]

Reference-compress semantics reproduced (dac/model/base.py:176-183,
:287-291): input is loudness-normalized to -16 dB LUFS before encoding (the
measured input loudness rides in the .fac header and decode restores it);
inputs longer than --streaming-threshold seconds go through the EXACT
bounded-memory streaming path instead of a whole-utterance XLA program.
"""

from __future__ import annotations

import argparse
import os


def add_encode_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--input", type=str, required=True)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--ckpt-path", type=str, default=None)
    p.add_argument("--config-path", type=str, default=None)
    p.add_argument("--n-c", type=int, default=2)
    p.add_argument("--normalize-db", type=float, default=-16.0,
                   help="loudness-normalize input to this LUFS before encode "
                        "(reference base.py:176-183)")
    p.add_argument("--no-normalize", action="store_true")
    p.add_argument("--streaming-threshold", type=float, default=30.0,
                   help="inputs longer than this many seconds encode through "
                        "the bounded-memory streaming path")
    p.add_argument("--chunk-frames", type=int, default=80,
                   help="streaming-path chunk size in latent frames")


def add_decode_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--input", type=str, required=True)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--ckpt-path", type=str, default=None)
    p.add_argument("--config-path", type=str, default=None)
    p.add_argument("--no-residual", action="store_true",
                   help="decode from prosody+content only (lower bitrate)")
    p.add_argument("--no-restore-loudness", action="store_true")
    p.add_argument("--streaming-threshold", type=float, default=30.0)
    p.add_argument("--chunk-frames", type=int, default=80)


def main_encode(args: argparse.Namespace) -> str:
    import numpy as np

    from facodec_tpu.api import FACodec, SR
    from facodec_tpu.cli._io import DEFAULT_CONFIG, load_wav
    from facodec_tpu.ops.loudness import normalize_loudness

    codec = FACodec.from_config(
        args.config_path or DEFAULT_CONFIG, args.ckpt_path, n_c=args.n_c
    )
    wave = load_wav(args.input)
    input_db = None
    if not args.no_normalize:
        wave, input_db = normalize_loudness(wave, SR, args.normalize_db)

    if len(wave) / SR > args.streaming_threshold:
        f = codec.encode_streaming(wave, chunk_frames=args.chunk_frames)
    else:
        f = codec.encode(wave)
    if input_db is not None and np.isfinite(input_db):
        f.metadata["input_db"] = float(input_db)
    out = args.output or os.path.splitext(args.input)[0] + ".fac"
    f.save(out)
    kbps = (
        (f.codes_p.shape[1] + f.codes_c.shape[1] +
         (f.codes_r.shape[1] if f.codes_r is not None else 0))
        * 10 * (f.sample_rate / f.hop_length) / 1000.0
    )
    print(f"{out} ({kbps:.1f} kbps + timbre)")
    return out


def main_decode(args: argparse.Namespace) -> str:
    from facodec_tpu.api import FACodec
    from facodec_tpu.cli._io import DEFAULT_CONFIG, save_wav
    from facodec_tpu.codec_file import FACodecFile
    from facodec_tpu.ops.loudness import normalize_loudness

    codec = FACodec.from_config(args.config_path or DEFAULT_CONFIG, args.ckpt_path)
    f = FACodecFile.load(args.input)
    n_frames = f.codes_p.shape[-1]
    if n_frames * f.hop_length / f.sample_rate > args.streaming_threshold:
        wave = codec.decode_streaming(
            f, use_residual=not args.no_residual, chunk_frames=args.chunk_frames
        )
    else:
        wave = codec.decode(f, use_residual=not args.no_residual)
    input_db = f.metadata.get("input_db")
    if input_db is not None and not args.no_restore_loudness:
        # restore the pre-normalization loudness (reference base.py:287-291)
        wave_r, _ = normalize_loudness(wave[0], f.sample_rate, float(input_db))
        wave = wave_r[None]
    out = args.output or os.path.splitext(args.input)[0] + ".decoded.wav"
    save_wav(out, wave, f.sample_rate)
    print(out)
    return out
