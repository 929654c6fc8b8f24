"""Generate the checked-in evaluation scorecard (VERDICT r2 #9): a fixed
deterministic synthetic manifest -> `cli/evaluate` -> examples/scorecard.json,
so the objective-metric pipeline output is comparable across rounds (and
becomes a real quality record the moment a trained checkpoint exists —
pass --ckpt-path through).

    python scripts/make_scorecard.py [--out examples/scorecard.json]
        [--ckpt-path ...] [--config-path ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

SR = 24000


def synth_utterances(outdir: str):
    """Deterministic speech-like synthetic set: pitch/amplitude-modulated
    harmonics at three F0s + one noisy utterance (exactly reproducible —
    no RNG state leaks between rounds)."""
    from scipy.io import wavfile

    os.makedirs(outdir, exist_ok=True)
    paths = []
    rng = np.random.RandomState(1234)
    for i, (f0, secs) in enumerate([(120.0, 2.0), (200.0, 2.5), (320.0, 1.5)]):
        t = np.arange(int(secs * SR)) / SR
        vib = f0 * (1 + 0.05 * np.sin(2 * np.pi * 3.1 * t))
        phase = 2 * np.pi * np.cumsum(vib) / SR
        x = sum(np.sin(k * phase) / k for k in (1, 2, 3, 4, 5))
        env = 0.5 + 0.5 * np.square(np.sin(2 * np.pi * 1.7 * t))
        x = 0.4 * x * env / np.abs(x * env).max()
        p = os.path.join(outdir, f"synth_{i}.wav")
        wavfile.write(p, SR, (x * 32767).astype(np.int16))
        paths.append(p)
    noise = 0.1 * rng.standard_normal(SR * 2)
    p = os.path.join(outdir, "synth_noise.wav")
    wavfile.write(p, SR, (noise * 32767).astype(np.int16))
    paths.append(p)
    manifest = os.path.join(outdir, "manifest.txt")
    with open(manifest, "w") as f:
        for i, p in enumerate(paths):
            f.write(f"{p}\t{i}\ten\ttext\tphones\n")
    return manifest


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="examples/scorecard.json")
    ap.add_argument("--ckpt-path", default=None)
    ap.add_argument("--config-path", default=None)
    ap.add_argument("--workdir", default="/tmp/facodec_scorecard")
    ap.add_argument("--provenance-json", default=None,
                    help="path to a JSON file (e.g. a *_train_curve.json) "
                         "whose 'provenance' object is embedded in the "
                         "scorecard's provenance as 'training'")
    args = ap.parse_args(argv)

    try:
        from facodec_tpu.utils.cache import enable_compile_cache

        enable_compile_cache()
    except Exception:
        pass

    manifest = synth_utterances(args.workdir)
    from facodec_tpu.cli.evaluate import main as eval_main

    tmp_json = os.path.join(args.workdir, "eval.json")
    rc = eval_main(["--manifest", manifest, "--json", tmp_json]
                   + (["--ckpt-path", args.ckpt_path] if args.ckpt_path else [])
                   + (["--config-path", args.config_path]
                      if args.config_path else []))
    if rc != 0:
        return rc
    data = json.load(open(tmp_json))
    data["provenance"] = {
        "weights": (
            f"TRAINED checkpoint {os.path.basename(args.ckpt_path)}"
            if args.ckpt_path
            else "random (seed 0) — infra record, not a quality claim; "
                 "becomes a quality record once a trained checkpoint is "
                 "passed"
        ),
        "manifest": "deterministic synthetic set (this script)",
    }
    if args.provenance_json:
        data["provenance"]["training"] = json.load(
            open(args.provenance_json)).get("provenance")
    # strip machine-local paths for a stable checked-in artifact
    for u in data["utterances"]:
        u["path"] = os.path.basename(u["path"])
    from facodec_tpu.cli.evaluate import jsonsafe

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(jsonsafe(data), f, indent=1, sort_keys=True, allow_nan=False)
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
