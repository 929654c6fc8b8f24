"""Objective evaluation over a manifest of wavs — a WORKING replacement for
the reference's bit-rotted eval.py (it calls the quantizer with an obsolete
signature and imports a package missing from its requirements;
SURVEY.md §2.3).

Metrics per utterance and aggregate:
  mel_l1        7-scale mel-spectrogram L1 (the training objective)
  stft_l1       multi-scale log-STFT L1
  snr_db        waveform SNR of the reconstruction
  si_sdr_db     scale-invariant SDR (ops/metrics.py)
  stoi          short-time objective intelligibility [0..1]
  mcd_db        mel-cepstral distortion (frame-aligned, 13 cepstra)
  code_usage    fraction of each stream's codebook used (collapse detector)

Disentanglement scorecard (--probe-disentangle): prosody-only and
content-only decodes are F0-tracked and correlated against the source —
the factorization property the reference audits only by ear through
TensorBoard audio (train.py:428-466), quantified:
  f0_corr_prosody   should be HIGH (prosody stream carries the contour)
  f0_corr_content   should be LOW  (content stream should not)

    python -m facodec_tpu.cli.evaluate --manifest data/val.txt
        [--root ./data] [--ckpt-path ...] [--config-path ...] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def evaluate_utterance(codec, wave: np.ndarray, probe_disentangle: bool = True):
    import jax.numpy as jnp

    from facodec_tpu.losses import mel_spectrogram_loss, multi_scale_stft_loss
    from facodec_tpu.ops.metrics import (f0_autocorr, f0_correlation, mcd,
                                         si_sdr, stoi)

    f = codec.encode(wave)
    recon = codec.decode(f)[0]
    ref = wave[: len(recon)]
    recon = recon[: len(ref)]

    x, y = jnp.asarray(recon)[None], jnp.asarray(ref)[None]
    mel_l1 = float(mel_spectrogram_loss(x, y))
    stft_l1 = float(multi_scale_stft_loss(x, y))
    noise = np.mean((recon - ref) ** 2) + 1e-12
    snr = 10.0 * np.log10(np.mean(ref**2) / noise + 1e-12)
    cbs = float(getattr(codec.models["quantizer"], "codebook_size", 1024))
    usage = {
        "prosody": len(np.unique(f.codes_p)) / cbs,
        "content": len(np.unique(f.codes_c)) / cbs,
        "residual": len(np.unique(f.codes_r)) / cbs if f.codes_r is not None else 0.0,
    }
    out = dict(
        mel_l1=mel_l1, stft_l1=stft_l1, snr_db=float(snr),
        si_sdr_db=si_sdr(recon, ref), stoi=stoi(recon, ref, 24000),
        mcd_db=mcd(recon, ref), code_usage=usage,
    )
    if probe_disentangle:
        f0_src = f0_autocorr(ref)
        p_only = codec.decode_subset(f, True, False, False)[0]
        c_only = codec.decode_subset(f, False, True, False)[0]
        r_p, v_p = f0_correlation(f0_autocorr(p_only), f0_src)
        r_c, v_c = f0_correlation(f0_autocorr(c_only), f0_src)
        out.update(
            f0_corr_prosody=r_p, f0_corr_content=r_c,
            voicing_agree_prosody=v_p, voicing_agree_content=v_c,
        )
    return out


AGG_KEYS = ("mel_l1", "stft_l1", "snr_db", "si_sdr_db", "stoi", "mcd_db",
            "f0_corr_prosody", "f0_corr_content")


def jsonsafe(o):
    """Map non-finite floats to None so emitted JSON is strict (json.dump
    otherwise writes literal NaN/Infinity tokens, which non-Python parsers
    reject). F0 correlations are legitimately NaN when an utterance has no
    voiced frames in common (e.g. untrained weights)."""
    if isinstance(o, float) and not np.isfinite(o):
        return None
    if isinstance(o, dict):
        return {k: jsonsafe(v) for k, v in o.items()}
    if isinstance(o, (list, tuple)):
        return [jsonsafe(v) for v in o]
    return o


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--manifest", type=str, required=True)
    p.add_argument("--root", type=str, default="")
    p.add_argument("--ckpt-path", type=str, default=None)
    p.add_argument("--config-path", type=str, default=None)
    p.add_argument("--n-c", type=int, default=2)
    p.add_argument("--max-utts", type=int, default=None)
    p.add_argument("--no-probe-disentangle", action="store_true")
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
        m = evaluate_utterance(codec, wave,
                               probe_disentangle=not args.no_probe_disentangle)
        m["path"] = path
        results.append(m)
        print(f"{path}: mel_l1={m['mel_l1']:.4f} stft_l1={m['stft_l1']:.4f} "
              f"snr={m['snr_db']:.2f}dB si_sdr={m['si_sdr_db']:.2f}dB "
              f"stoi={m['stoi']:.3f}")

    agg = {
        k: float(np.nanmean([r[k] for r in results]))
        for k in AGG_KEYS if k in results[0]
    }
    print("aggregate:", json.dumps(jsonsafe(agg)))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(jsonsafe(dict(aggregate=agg, utterances=results)), fh,
                      indent=1, allow_nan=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
