"""Stage-2 redecoder training on the TRAINED medium codec + VC probe.

Trains the redecoder (the reference's stage-2 zero-shot VC model,
train_redecoder.py:43-449 semantics via train/redecoder_loop.py) against
the FROZEN trained codec from `train_tiny_demo.py --size medium`, then
probes voice conversion quantitatively:

  * self-resynthesis: redecode the held-out utterance's codes with its OWN
    timbre — mel-L1 vs the source (the redecoder's reconstruction floor);
  * conversion: redecode with OTHER speakers' timbre vectors and measure
    (a) F0-contour correlation with the source (prosody must ride the
    codes, so it should stay HIGH under timbre swap) and (b) spectral
    centroid movement toward the target speaker (timbre must ride the
    timbre vector).

Artifacts: examples/medium_vc_probe.json (curve + probe results).

    python scripts/train_redecoder_demo.py [--steps 4000]
        [--codec-config /tmp/facodec_medium_train2/config.yml]
        [--codec-ckpt /tmp/facodec_medium_train2/FAcodec_epoch_00249_step_08000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from train_tiny_demo import SIZES, CaptureWriter, SyntheticSpeechDataset, _mel_l1  # noqa: E402

SR, HOP = 24000, 300

# injected INTO the codec config's model_params block: stage-'redecoder'
# extension keys at medium width (reference config_redecoder.yml analogues;
# wavenet depth is the builder's reference-exact 16 layers)
REDECODER_KEYS = """\
  encoder_causal: True
  decoder_causal: True
  encoder_lstm: 2
  decoder_lstm: 2
  n_p_codebooks: 1
  encoder_type: 'wavenet'
  wavenet_embed_dim: 128
"""


def _centroid(wave: np.ndarray) -> float:
    """Spectral centroid (Hz) — a scalar timbre proxy: higher harmonic tilt
    -> more HF energy -> higher centroid."""
    spec = np.abs(np.fft.rfft(wave * np.hanning(len(wave))))
    freqs = np.fft.rfftfreq(len(wave), 1.0 / SR)
    return float((spec * freqs).sum() / (spec.sum() + 1e-9))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--codec-config",
                    default="/tmp/facodec_medium_train2/config.yml")
    ap.add_argument("--codec-ckpt",
                    default="/tmp/facodec_medium_train2/"
                            "FAcodec_epoch_00249_step_08000")
    ap.add_argument("--workdir", default="/tmp/facodec_medium_redecoder")
    ap.add_argument("--out", default=os.path.join(REPO, "examples",
                                                  "medium_vc_probe.json"))
    ap.add_argument("--platform", default="default", choices=["cpu", "default"])
    args = ap.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from facodec_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import shutil

    shutil.rmtree(args.workdir, ignore_errors=True)
    os.makedirs(args.workdir, exist_ok=True)
    cfg_path = os.path.join(args.workdir, "config.yml")
    base = open(args.codec_config).read().replace(
        os.path.dirname(args.codec_config), args.workdir)
    assert "model_params:\n" in base
    base = base.replace("model_params:\n", "model_params:\n" + REDECODER_KEYS)
    with open(cfg_path, "w") as f:
        f.write(base)

    from facodec_tpu.api import FACodec, FARedecoder, _load_params
    from facodec_tpu.models.builder import build_model, init_params
    from facodec_tpu.train.loop import latest_checkpoint
    from facodec_tpu.train.redecoder_loop import run_redecoder_training
    from facodec_tpu.utils.config import load_config

    cfg = load_config(cfg_path)
    size = SIZES["medium"]
    data_kw = dict(n=size["data_n"], seconds=size["data_seconds"],
                   n_speakers=size["n_speakers"], n_phones=size["n_phones"],
                   rich=True)
    dataset = SyntheticSpeechDataset(**data_kw)
    items_plus = SyntheticSpeechDataset(
        **{**data_kw, "n": size["data_n"] + 1}).items
    holdout = items_plus[-1]  # not in the train set (per-index determinism)

    # frozen trained codec (stage 'encoder': codec encoder + quantizer)
    codec_models = build_model(cfg.model_params, stage="encoder")
    codec_templates = init_params(codec_models, jax.random.PRNGKey(1))
    codec_params = _load_params(args.codec_ckpt, codec_models, codec_templates)

    writer = CaptureWriter()
    t0 = time.time()
    run_redecoder_training(cfg_path, dataset=dataset, max_steps=args.steps,
                           codec_models=codec_models, codec_params=codec_params,
                           log_dir=args.workdir, log_writer=writer)
    wall = time.time() - t0
    ckpt = latest_checkpoint(args.workdir)

    # ---------------------------------------------------------- VC probe
    codec = FACodec.from_config(args.codec_config, args.codec_ckpt, n_c=2)
    red = FARedecoder.from_config(cfg_path, ckpt)

    from facodec_tpu.ops.metrics import f0_autocorr, f0_correlation

    src = holdout["wave"]
    f_src = codec.encode(src)
    f0_src = f0_autocorr(src, SR)
    c_src = _centroid(src)

    # self-resynthesis (own timbre): training-objective floor
    self_wave = red.resynthesize(f_src, f_src.timbre, use_p_code=True, n_c=2)[0]
    self_mel = _mel_l1(src[: len(self_wave)], self_wave[: len(src)])

    # conversion to 4 spread target speakers (their own held-out params)
    probes = []
    for spk in (0, 5, 10, 15):
        tgt = dataset.items[spk]["wave"]  # speaker exemplar utterance
        f_tgt = codec.encode(tgt)
        conv = red.resynthesize(f_src, f_tgt.timbre, use_p_code=True, n_c=2)[0]
        r_f0, _ = f0_correlation(f0_autocorr(conv, SR), f0_src)
        c_conv, c_tgt = _centroid(conv), _centroid(tgt)
        probes.append(dict(
            target_speaker=spk,
            f0_corr_vs_source=round(r_f0, 4) if np.isfinite(r_f0) else None,
            centroid_src_hz=round(c_src, 1),
            centroid_tgt_hz=round(c_tgt, 1),
            centroid_conv_hz=round(c_conv, 1),
            # 1.0 = landed on the target centroid, 0.0 = stayed at source
            timbre_shift_frac=round((c_conv - c_src) / (c_tgt - c_src), 3)
            if abs(c_tgt - c_src) > 1e-6 else None,
        ))

    mel_curve = writer.scalars.get("train/loss/mel", [])
    head = np.mean([v for _, v in mel_curve[:5]]) if mel_curve else None
    tail = np.mean([v for _, v in mel_curve[-5:]]) if mel_curve else None
    if len(mel_curve) > 200:
        mel_curve = mel_curve[:: max(1, len(mel_curve) // 200)] + [mel_curve[-1]]
    out = {
        "provenance": {
            "what": "stage-2 redecoder GAN loop (train/redecoder_loop.py) on "
                    "the FROZEN trained medium codec; same 256-utterance "
                    "synthetic set",
            "codec_ckpt": os.path.basename(args.codec_ckpt),
            "redecoder_ckpt": os.path.basename(ckpt) if ckpt else None,
            "steps": args.steps,
            "wall_seconds": round(wall, 1),
            "platform": jax.devices()[0].platform,
        },
        "train_mel_loss_curve": [
            {"step": s, "value": round(v, 4)} for s, v in mel_curve
        ],
        "train_mel_first5_mean": round(float(head), 4) if head else None,
        "train_mel_last5_mean": round(float(tail), 4) if tail else None,
        "holdout_self_resynth_mel_l1": round(self_mel, 4),
        "vc_probes": probes,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({
        "mel_first5": out["train_mel_first5_mean"],
        "mel_last5": out["train_mel_last5_mean"],
        "self_mel": out["holdout_self_resynth_mel_l1"],
        "probes": probes,
        "wall_s": round(wall, 1),
        "ckpt": ckpt,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
