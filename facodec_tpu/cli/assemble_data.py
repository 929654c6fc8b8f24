"""Offline data assembly (reference data/assemble_data.py:12-37): filter
transcript manifests by wav existence and duration (1-60 s), then 90/10
train/val split.

Manifest row format: `path\tsid\tlang\ttext\tphones` (data/val.txt).

    python -m facodec_tpu.cli.assemble_data --transcripts a.txt b.txt
        --target-dir ./data [--min-s 1] [--max-s 60] [--val-frac 0.1]
"""

from __future__ import annotations

import argparse
import os
import random


def wav_duration_s(path: str) -> float:
    """Duration without decoding the payload (scipy reads the header only
    for .wav via frame count)."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path, mmap=True)
    return data.shape[0] / sr


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--transcripts", type=str, nargs="+", required=True)
    p.add_argument("--target-dir", type=str, default="./data")
    p.add_argument("--min-s", type=float, default=1.0)
    p.add_argument("--max-s", type=float, default=60.0)
    p.add_argument("--val-frac", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    raw = []
    for t in args.transcripts:
        with open(t, encoding="utf-8") as f:
            raw += f.readlines()

    clean = []
    for line in raw:
        parts = line.rstrip("\n").split("\t")
        if not parts or not parts[0] or not os.path.exists(parts[0]):
            continue
        try:
            dur = wav_duration_s(parts[0])
        except Exception:
            continue
        if args.min_s <= dur <= args.max_s:
            clean.append(line if line.endswith("\n") else line + "\n")

    random.Random(args.seed).shuffle(clean)
    n_train = int(len(clean) * (1.0 - args.val_frac))
    os.makedirs(args.target_dir, exist_ok=True)
    with open(os.path.join(args.target_dir, "train.txt"), "w", encoding="utf-8") as f:
        f.writelines(clean[:n_train])
    with open(os.path.join(args.target_dir, "val.txt"), "w", encoding="utf-8") as f:
        f.writelines(clean[n_train:])
    print(f"[assemble_data] {n_train} train / {len(clean) - n_train} val")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
