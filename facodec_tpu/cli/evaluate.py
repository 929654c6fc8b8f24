"""Objective evaluation over a manifest of wavs — a WORKING replacement for
the reference's bit-rotted eval.py (it calls the quantizer with an obsolete
signature and imports a package missing from its requirements;
SURVEY.md §2.3).

Metrics per utterance and aggregate:
  mel_l1      7-scale mel-spectrogram L1 (the training objective)
  stft_l1     multi-scale log-STFT L1
  snr_db      waveform SNR of the reconstruction
  code_usage  fraction of each stream's codebook used (collapse detector)

    python -m facodec_tpu.cli.evaluate --manifest data/val.txt
        [--root ./data] [--ckpt-path ...] [--config-path ...] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def evaluate_utterance(codec, wave: np.ndarray):
    import jax.numpy as jnp

    from facodec_tpu.losses import mel_spectrogram_loss, multi_scale_stft_loss

    f = codec.encode(wave)
    recon = codec.decode(f)[0]
    ref = wave[: len(recon)]
    recon = recon[: len(ref)]

    x, y = jnp.asarray(recon)[None], jnp.asarray(ref)[None]
    mel_l1 = float(mel_spectrogram_loss(x, y))
    stft_l1 = float(multi_scale_stft_loss(x, y))
    noise = np.mean((recon - ref) ** 2) + 1e-12
    snr = 10.0 * np.log10(np.mean(ref**2) / noise + 1e-12)
    usage = {
        "prosody": len(np.unique(f.codes_p)) / 1024.0,
        "content": len(np.unique(f.codes_c)) / 1024.0,
        "residual": len(np.unique(f.codes_r)) / 1024.0 if f.codes_r is not None else 0.0,
    }
    return dict(mel_l1=mel_l1, stft_l1=stft_l1, snr_db=float(snr),
                code_usage=usage)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--manifest", type=str, required=True)
    p.add_argument("--root", type=str, default="")
    p.add_argument("--ckpt-path", type=str, default=None)
    p.add_argument("--config-path", type=str, default=None)
    p.add_argument("--n-c", type=int, default=2)
    p.add_argument("--max-utts", type=int, default=None)
    p.add_argument("--json", type=str, default=None)
    args = p.parse_args(argv)

    from facodec_tpu.api import FACodec
    from facodec_tpu.cli._io import DEFAULT_CONFIG
    from facodec_tpu.train.data import load_wav

    codec = FACodec.from_config(args.config_path or DEFAULT_CONFIG,
                                args.ckpt_path, n_c=args.n_c)

    rows = []
    with open(args.manifest) as fh:
        for line in fh:
            parts = line.rstrip("\n").split("\t")
            if not parts or not parts[0]:
                continue
            path = os.path.join(args.root, parts[0]) if args.root else parts[0]
            rows.append(path)
    if args.max_utts:
        rows = rows[: args.max_utts]

    results = []
    for path in rows:
        wave = load_wav(path)
        m = evaluate_utterance(codec, wave)
        m["path"] = path
        results.append(m)
        print(f"{path}: mel_l1={m['mel_l1']:.4f} stft_l1={m['stft_l1']:.4f} "
              f"snr={m['snr_db']:.2f}dB")

    agg = {
        k: float(np.mean([r[k] for r in results]))
        for k in ("mel_l1", "stft_l1", "snr_db")
    }
    print("aggregate:", json.dumps(agg))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(dict(aggregate=agg, utterances=results), fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
