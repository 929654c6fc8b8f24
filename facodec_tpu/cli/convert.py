"""Zero-shot voice conversion CLI (reference reconstruct_redecoder.py:94-128).

    python -m facodec_tpu convert --source src.wav --target tgt.wav
        [--output out.wav] [--codec-ckpt ...] [--redecoder-ckpt ...]
"""

from __future__ import annotations

import argparse
import os


def add_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--source", type=str, required=True)
    p.add_argument("--target", type=str, required=True)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--codec-ckpt", type=str, default=None)
    p.add_argument("--redecoder-ckpt", type=str, default=None)
    p.add_argument("--codec-config", type=str, default=None)
    p.add_argument("--redecoder-config", type=str, default=None)
    p.add_argument("--use-p-code", action="store_true",
                   help="also feed prosody codes (reference uses content only)")


def main(args: argparse.Namespace) -> str:
    from facodec_tpu.api import FACodec, FARedecoder, convert_voice
    from facodec_tpu.cli._io import (
        DEFAULT_CONFIG, DEFAULT_REDECODER_CONFIG, load_wav, save_wav,
    )

    codec = FACodec.from_config(
        args.codec_config or DEFAULT_CONFIG, args.codec_ckpt, n_c=1
    )
    red = FARedecoder.from_config(
        args.redecoder_config or DEFAULT_REDECODER_CONFIG, args.redecoder_ckpt
    )
    src = load_wav(args.source)
    tgt = load_wav(args.target)
    converted = convert_voice(codec, red, src, tgt)
    s = os.path.splitext(os.path.basename(args.source))[0]
    t = os.path.splitext(os.path.basename(args.target))[0]
    out = args.output or os.path.join("converted", f"vc_{s}_{t}.wav")
    save_wav(out, converted)
    print(out)
    return out


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    add_args(p)
    main(p.parse_args())
