"""Quickstart: load a codec, round-trip a wav, write a .fac artifact.

    python examples/quickstart_codec.py --config configs/config.yml \
        --ckpt checkpoints/pytorch_model.bin --wav input.wav

Without --ckpt this runs with random weights (useful for smoke-testing an
environment; the output is noise-shaped audio)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from facodec_tpu import FACodec
from facodec_tpu.cli._io import load_wav, save_wav


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="/root/reference/configs/config.yml")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--wav", required=True)
    args = p.parse_args()

    codec = FACodec.from_config(args.config, args.ckpt)
    wave = load_wav(args.wav)

    # 1. compression artifact: factorized codes + timbre at 4.8 kbps
    fac = codec.encode(wave)
    path = fac.save(args.wav + ".fac")
    print("codes:", {k: getattr(fac, k).shape for k in ("codes_p", "codes_c", "codes_r")})

    # 2. decode it back
    recon = codec.decode(fac)
    save_wav(args.wav + ".recon.wav", recon)

    # 3. timbre vector (the continuous stream)
    print("timbre:", codec.timbre_of(wave).shape, "->", path)


if __name__ == "__main__":
    main()
