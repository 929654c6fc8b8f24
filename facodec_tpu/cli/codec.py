"""encode/decode CLI — the `python -m dac encode|decode` analog
(reference dac/__main__.py:12-36, dac/utils/{encode,decode}.py) producing
.fac artifacts (codes + timbre) instead of .dac files.

    python -m facodec_tpu encode --input in.wav [--output out.fac] [...]
    python -m facodec_tpu decode --input out.fac [--output out.wav]
        [--no-residual]
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


def add_decode_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--input", type=str, required=True)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--ckpt-path", type=str, default=None)
    p.add_argument("--config-path", type=str, default=None)
    p.add_argument("--no-residual", action="store_true",
                   help="decode from prosody+content only (lower bitrate)")


def main_encode(args: argparse.Namespace) -> str:
    from facodec_tpu.api import FACodec
    from facodec_tpu.cli._io import DEFAULT_CONFIG, load_wav

    codec = FACodec.from_config(
        args.config_path or DEFAULT_CONFIG, args.ckpt_path, n_c=args.n_c
    )
    wave = load_wav(args.input)
    f = codec.encode(wave)
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

    codec = FACodec.from_config(args.config_path or DEFAULT_CONFIG, args.ckpt_path)
    f = FACodecFile.load(args.input)
    wave = codec.decode(f, use_residual=not args.no_residual)
    out = args.output or os.path.splitext(args.input)[0] + ".decoded.wav"
    save_wav(out, wave, f.sample_rate)
    print(out)
    return out
