"""Offline teacher-target extraction — the TPU-native replacement for the
reference's per-step torch teacher inference (train.py:91-101, 181-186,
340-344; SURVEY.md §2.2/§7 'hard parts' #5).

For every wav in a manifest, writes `<wav>.targets.npz` with:
  f0        (frames,) raw F0 Hz from the JDC teacher (JAX reimplementation,
            weights from the reference's modules/JDC/bst.t7)
  phone_ids (frames,) frame phoneme ids from wav2vec2 CTC argmax (requires
            the HF model `facebook/wav2vec2-xlsr-53-espeak-cv-ft`)
  spk_label ()       speaker id from TitaNet (requires NeMo) or the manifest
            sid column as fallback

A requested teacher that is unavailable is a HARD ERROR (exit 2) — training
on real data must never silently use zero labels (the reference runs all
three teachers unconditionally in its loop, train.py:91-101). Explicitly
opt out of teachers with --teachers / --allow-missing; `--allow-missing
titanet` falls back to the manifest sid column (real labels, not zeros).

    python -m facodec_tpu.cli.extract_targets --manifest data/train.txt
        [--root ./data] [--jdc-ckpt modules/JDC/bst.t7]
        [--teachers jdc,w2v,titanet] [--allow-missing titanet]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _jdc_fn(jdc_ckpt: str):
    if not jdc_ckpt or not os.path.exists(jdc_ckpt):
        return None
    import jax
    import jax.numpy as jnp

    from facodec_tpu.models.jdc import JDCNet, load_jdc_checkpoint

    params = {"params": load_jdc_checkpoint(jdc_ckpt)}
    mod = JDCNet(num_class=1)
    fn = jax.jit(mod.apply)

    def run(mel: np.ndarray) -> np.ndarray:  # (frames, 80) -> (frames,)
        f0, _ = fn(params, jnp.asarray(mel)[None])
        return np.asarray(f0)[0]

    return run


def _w2v_fn(name: str = ""):
    """Frame-phoneme teacher: wav2vec2 CTC argmax (train.py:95-97, 181-186).

    `name` may be an HF hub id or a LOCAL directory (save_pretrained layout)
    — the local path keeps the real transformers inference path exercisable
    in zero-egress environments (tests/test_api_cli.py builds a tiny
    random-init model offline and runs this exact code)."""
    try:
        import torch
        from transformers import Wav2Vec2ForCTC, Wav2Vec2Processor

        name = name or "facebook/wav2vec2-xlsr-53-espeak-cv-ft"
        processor = Wav2Vec2Processor.from_pretrained(name)
        model = Wav2Vec2ForCTC.from_pretrained(name).eval()

        def run(wave24k: np.ndarray, frames: int) -> np.ndarray:
            # resample 24k -> 16k (linear; the reference uses torchaudio)
            t16 = np.linspace(0, len(wave24k) / 24000, int(len(wave24k) * 2 / 3),
                              endpoint=False)
            t24 = np.arange(len(wave24k)) / 24000
            w16 = np.interp(t16, t24, wave24k).astype(np.float32)
            inputs = processor(w16, sampling_rate=16000, return_tensors="pt")
            with torch.no_grad():
                logits = model(inputs.input_values).logits
            ids = logits.argmax(-1)[0].numpy()  # (w2v frames,)
            # nearest-interpolate to mel frames (train.py:185-186)
            idx = np.clip((np.arange(frames) * len(ids) / frames).astype(int),
                          0, len(ids) - 1)
            return ids[idx].astype(np.int32)

        return run
    except Exception as e:  # pragma: no cover - environment-dependent
        print(f"[extract_targets] w2v teacher unavailable ({type(e).__name__}); "
              "phone_ids will be zeros")
        return None


def _titanet_fn(model_path: str = ""):
    """Speaker teacher: 20000-way speaker-logits argmax over the 16 kHz wave
    (reference train.py:99-101, 340-344 runs NVIDIA TitaNet live via NeMo).

    `model_path` selects the backend:
      * "" — NeMo pretrained download (the reference's exact teacher);
      * a `.nemo` checkpoint — NeMo restore_from (offline NeMo weights);
      * any other existing file — a TorchScript module mapping a 16 kHz wave
        (1, T) float tensor -> (1, n_speakers) logits. This keeps the REAL
        branch (resample, torch inference, argmax) exercisable in zero-egress
        / NeMo-less environments — tests/test_api_cli.py scripts a tiny
        stand-in producing 20000-way logits and drives this exact code."""
    try:
        import torch

        if model_path and os.path.isfile(model_path) and not model_path.endswith(".nemo"):
            scripted = torch.jit.load(model_path).eval()

            def infer(w16: "torch.Tensor") -> "torch.Tensor":
                with torch.no_grad():
                    return scripted(w16[None])
        else:  # pragma: no cover - NeMo rarely available
            import nemo.collections.asr as nemo_asr  # type: ignore

            model = (
                nemo_asr.models.EncDecSpeakerLabelModel.restore_from(model_path)
                if model_path else
                nemo_asr.models.EncDecSpeakerLabelModel.from_pretrained(
                    "nvidia/speakerverification_en_titanet_large")
            ).eval()

            def infer(w16: "torch.Tensor") -> "torch.Tensor":
                _, logits = model.infer_segment(w16)
                return logits

        def run(wave24k: np.ndarray) -> int:
            import torch

            t16 = np.linspace(0, len(wave24k) / 24000, int(len(wave24k) * 2 / 3),
                              endpoint=False)
            t24 = np.arange(len(wave24k)) / 24000
            w16 = torch.from_numpy(np.interp(t16, t24, wave24k).astype(np.float32))
            return int(torch.as_tensor(infer(w16)).reshape(-1).argmax())

        return run
    except Exception as e:
        print(f"[extract_targets] TitaNet teacher unavailable ({type(e).__name__}); "
              "spk_label falls back to the manifest sid")
        return None


TEACHERS = ("jdc", "w2v", "titanet")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--manifest", type=str, required=True)
    p.add_argument("--root", type=str, default="")
    p.add_argument("--jdc-ckpt", type=str,
                   default=os.environ.get("FACODEC_JDC_CKPT", ""))
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--teachers", type=str, default="jdc,w2v,titanet",
                   help="comma list of teachers to run (subset of jdc,w2v,titanet)")
    p.add_argument("--w2v-model", type=str,
                   default=os.environ.get("FACODEC_W2V_MODEL", ""),
                   help="wav2vec2 CTC model: HF hub id or local "
                        "save_pretrained directory (default: the reference's "
                        "facebook/wav2vec2-xlsr-53-espeak-cv-ft)")
    p.add_argument("--titanet-model", type=str,
                   default=os.environ.get("FACODEC_TITANET_MODEL", ""),
                   help="speaker teacher: empty = NeMo pretrained TitaNet "
                        "download, a .nemo checkpoint, or a TorchScript file "
                        "(wave16k (1,T) -> (1, n_spk) logits) for offline use")
    p.add_argument("--allow-missing", type=str, default="",
                   help="teachers allowed to be unavailable: jdc/w2v fill "
                        "zeros, titanet falls back to the manifest sid. "
                        "Without this flag an unavailable teacher is a hard "
                        "error (exit 2) — training must not silently see "
                        "zero labels.")
    args = p.parse_args(argv)

    requested = [t.strip() for t in args.teachers.split(",") if t.strip()]
    allow_missing = {t.strip() for t in args.allow_missing.split(",") if t.strip()}
    for t in list(requested) + sorted(allow_missing):
        if t not in TEACHERS:
            p.error(f"unknown teacher {t!r}; valid: {', '.join(TEACHERS)}")

    from facodec_tpu.train.data import compute_mel, load_wav

    jdc = _jdc_fn(args.jdc_ckpt) if "jdc" in requested else None
    w2v = _w2v_fn(args.w2v_model) if "w2v" in requested else None
    titanet = _titanet_fn(args.titanet_model) if "titanet" in requested else None

    # hard gate: a requested-but-unavailable teacher aborts unless the user
    # explicitly allowed it (reference runs all three live, train.py:91-101)
    missing = [
        name for name, fn in (("jdc", jdc), ("w2v", w2v), ("titanet", titanet))
        if name in requested and fn is None
    ]
    fatal = [t for t in missing if t not in allow_missing]
    if fatal:
        print(f"[extract_targets] ERROR: requested teacher(s) unavailable: "
              f"{', '.join(fatal)}. Install the dependency/weights, drop them "
              f"from --teachers, or pass --allow-missing {','.join(fatal)} to "
              "accept degraded targets.")
        return 2
    for t in missing:
        fallback = "manifest sid" if t == "titanet" else "zeros"
        print(f"[extract_targets] WARNING: {t} unavailable (allowed); "
              f"falling back to {fallback}")

    n = 0
    with open(args.manifest) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if not parts or not parts[0]:
                continue
            path = os.path.join(args.root, parts[0]) if args.root else parts[0]
            out = path + ".targets.npz"
            if os.path.exists(out) and not args.overwrite:
                continue
            wave = load_wav(path)
            frames = len(wave) // 300
            wave = wave[: frames * 300]
            mel = compute_mel(wave)
            f0 = jdc(mel) if jdc else np.zeros(frames, np.float32)
            phones = w2v(wave, frames) if w2v else np.zeros(frames, np.int32)
            sid = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else 0
            spk = titanet(wave) if titanet else sid % 20000
            np.savez(out, f0=f0.astype(np.float32),
                     phone_ids=phones.astype(np.int32),
                     spk_label=np.int32(spk))
            n += 1
    print(f"[extract_targets] wrote {n} target files")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
