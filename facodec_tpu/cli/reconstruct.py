"""Codec round-trip CLI (reference reconstruct.py:46-65).

    python -m facodec_tpu reconstruct --source in.wav [--output out.wav]
        [--ckpt-path ckpt] [--config-path cfg] [--n-c 2] [--max-seconds 30]
"""

from __future__ import annotations

import argparse
import os


def add_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--source", type=str, required=True)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--ckpt-path", type=str, default=None)
    p.add_argument("--config-path", type=str, default=None)
    p.add_argument("--n-c", type=int, default=2)
    p.add_argument("--max-seconds", type=float, default=30.0,
                   help="crop like the reference (reconstruct.py:52)")


def main(args: argparse.Namespace) -> str:
    from facodec_tpu.api import FACodec
    from facodec_tpu.cli._io import DEFAULT_CONFIG, load_wav, save_wav

    codec = FACodec.from_config(
        args.config_path or DEFAULT_CONFIG, args.ckpt_path, n_c=args.n_c
    )
    wave = load_wav(args.source)
    wave = wave[: int(args.max_seconds * 24000)]
    recon = codec.reconstruct(wave)
    out = args.output or os.path.join(
        "reconstructed", os.path.basename(args.source)
    )
    save_wav(out, recon)
    print(out)
    return out


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    add_args(p)
    main(p.parse_args())
