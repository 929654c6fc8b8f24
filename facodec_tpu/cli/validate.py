"""Pretrained-checkpoint parity gate — THE first command to run when the
released `Plachta/FAcodec` checkpoint is reachable.

Checks the BASELINE.json north star on a real checkpoint: bit-exact
factorized codes and mel-L1 <= 1e-3 against the PyTorch reference
(reconstruct.py:19-65 semantics). Three comparison sources, tried in order:

  1. --golden out.npz      compare against a stored torch-side golden
                           (produced by --emit-golden on a torch machine)
  2. live torch reference  if torch + the reference repo (--reference-dir)
                           import, run it in-process and compare directly
  3. (neither)             exit 3 with instructions

Checkpoint/config resolution: --ckpt/--config paths if given, else attempt
the HF download (hf.py; degrades with a clear message in zero-egress envs).

    # zero-egress env today (random-weight ckpt, live torch compare):
    python -m facodec_tpu validate --ckpt ckpt.bin --config config.yml --wav x.wav

    # the moment egress appears:
    python -m facodec_tpu validate --wav x.wav     # downloads Plachta/FAcodec

Output: ONE JSON line
  {"codes_bit_exact": bool, "mel_l1": float, "pass": bool, "source": "..."}
exit 0 = parity holds, 1 = parity broken, 3 = nothing to compare against.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

MEL_L1_THRESHOLD = 1e-3


def add_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--ckpt", type=str, default="",
                   help="torch checkpoint (.bin/.pth); empty = HF download")
    p.add_argument("--config", type=str, default="",
                   help="model config.yml; empty = HF download")
    p.add_argument("--wav", type=str, default="",
                   help="24 kHz test wav; empty = deterministic synthetic tone")
    p.add_argument("--golden", type=str, default="",
                   help="stored torch-side golden .npz to compare against")
    p.add_argument("--emit-golden", type=str, default="",
                   help="write the torch-side golden .npz (requires torch + "
                        "reference repo) instead of validating")
    p.add_argument("--reference-dir", type=str, default="/root/reference",
                   help="checkout of Plachtaa/FAcodec for the live torch path")
    p.add_argument("--seconds", type=float, default=2.0)
    p.add_argument("--mel-threshold", type=float, default=MEL_L1_THRESHOLD,
                   help="mel-L1 pass threshold (BASELINE.json north star)")


def _test_wave(path: str, seconds: float) -> np.ndarray:
    if path:
        from facodec_tpu.train.data import load_wav

        w = load_wav(path)
    else:
        # deterministic multi-tone chirp: exercises pitch movement + energy
        sr = 24000
        t = np.arange(int(seconds * sr)) / sr
        w = (0.4 * np.sin(2 * np.pi * (150 + 80 * t) * t)
             + 0.2 * np.sin(2 * np.pi * 420 * t)).astype(np.float32)
        w *= np.exp(-0.5 * ((t - t[-1] / 2) / (t[-1] / 3)) ** 2).astype(np.float32)
    n = len(w) // 300 * 300
    return np.asarray(w[:n], np.float32)


def _resolve_ckpt(args):
    if args.ckpt and args.config:
        return args.ckpt, args.config
    try:
        from facodec_tpu.hf import load_custom_model_from_hf

        print("[validate] downloading Plachta/FAcodec ...", file=sys.stderr)
        return load_custom_model_from_hf("Plachta/FAcodec")
    except Exception as e:
        print(f"[validate] HF download unavailable ({type(e).__name__}: {e}); "
              "pass --ckpt/--config explicitly", file=sys.stderr)
        return None, None


def _torch_reference_outputs(ckpt: str, config: str, wave: np.ndarray,
                             reference_dir: str):
    """Run the torch reference round trip (reconstruct.py:56-65). Returns
    dict(codes_p, codes_c, codes_r, timbre, recon) or None if torch/the
    reference repo is unavailable."""
    try:
        import torch

        # the stub installer for the reference's heavy deps lives in tests/
        # (audiotools/torchaudio/munch shims); fall back to a bare import
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        tests_dir = os.path.join(repo_root, "tests")
        if os.path.isdir(tests_dir) and tests_dir not in sys.path:
            sys.path.insert(0, tests_dir)
        try:
            from ref_stubs import install_reference  # type: ignore

            install_reference()
        except ImportError:
            if reference_dir not in sys.path:
                sys.path.insert(0, reference_dir)
        if not os.path.isdir(reference_dir):
            return None
        import yaml
        from modules.commons import build_model, recursive_munch  # type: ignore

        cfg = recursive_munch(yaml.safe_load(open(config)))
        model = build_model(cfg.model_params, stage="codec")
        sd = torch.load(ckpt, map_location="cpu", weights_only=False)
        sd = sd.get("net", sd)
        for k in model:
            if k in sd:
                state = {kk.removeprefix("module."): v for kk, v in sd[k].items()}
                model[k].load_state_dict(state)
            model[k].eval()

        w = torch.from_numpy(wave)[None]  # (1, T)
        with torch.no_grad():
            z = model.encoder(w.unsqueeze(1))  # (1, 1, T) -> (1, C, T')
            outs, _, _, _, timbre, codes = model.quantizer(
                z, w.unsqueeze(1), n_c=2, full_waves=None, wave_lens=None,
                return_codes=True,
            )
            recon = model.decoder(outs)
        return dict(
            codes_p=codes[0].numpy(), codes_c=codes[1].numpy(),
            codes_r=codes[2].numpy(), timbre=timbre.numpy(),
            recon=recon[:, 0].numpy(),
        )
    except Exception as e:
        print(f"[validate] live torch reference unavailable "
              f"({type(e).__name__}: {e})", file=sys.stderr)
        return None


def _mel_l1(a: np.ndarray, b: np.ndarray) -> float:
    """L1 over the 80-bin normalized log-mel (the training front-end)."""
    import jax.numpy as jnp

    from facodec_tpu.ops.spectral import log_mel_spectrogram

    ma = log_mel_spectrogram(jnp.asarray(a))
    mb = log_mel_spectrogram(jnp.asarray(b))
    n = min(ma.shape[1], mb.shape[1])
    return float(jnp.mean(jnp.abs(ma[:, :n] - mb[:, :n])))


def main(args) -> int:
    # parity gate: exactness over speed. On TPU the DEFAULT f32 matmul/conv
    # precision is bf16-multiply/f32-accumulate, which flips VQ argmins vs
    # the torch CPU reference — pin full-f32 multiplies for this command.
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")

    wave = _test_wave(args.wav, args.seconds)

    ckpt, config = _resolve_ckpt(args)
    if not ckpt:
        print(json.dumps({"pass": False, "error": "no checkpoint available"}))
        return 3

    if args.emit_golden:
        ref = _torch_reference_outputs(ckpt, config, wave, args.reference_dir)
        if ref is None:
            print(json.dumps({"pass": False,
                              "error": "torch reference unavailable for golden"}))
            return 3
        np.savez(args.emit_golden, **ref)
        print(json.dumps({"golden": args.emit_golden,
                          "frames": int(ref["codes_p"].shape[-1])}))
        return 0

    # ---- reference outputs
    source = None
    if args.golden:
        ref = dict(np.load(args.golden))
        source = "golden-file"
    else:
        ref = _torch_reference_outputs(ckpt, config, wave, args.reference_dir)
        source = "live-torch"
    if ref is None:
        print(json.dumps({
            "pass": False,
            "error": "no comparison source: provide --golden (from "
                     "--emit-golden on a torch machine) or --reference-dir",
        }))
        return 3

    # ---- our outputs
    from facodec_tpu.api import FACodec

    codec = FACodec.from_config(config, ckpt, n_c=2)
    f = codec.encode(wave[None])
    recon = codec.reconstruct(wave[None])

    codes_ok = all(
        np.array_equal(np.asarray(getattr(f, k), np.int64),
                       np.asarray(ref[k], np.int64))
        for k in ("codes_p", "codes_c", "codes_r")
    )
    n = min(recon.shape[-1], ref["recon"].shape[-1])
    mel_l1 = _mel_l1(recon[:, :n], ref["recon"][:, :n])
    timbre_md = float(np.max(np.abs(f.timbre - ref["timbre"])))

    threshold = getattr(args, "mel_threshold", MEL_L1_THRESHOLD)
    ok = bool(codes_ok and mel_l1 <= threshold)
    print(json.dumps({
        "codes_bit_exact": bool(codes_ok),
        "mel_l1": round(mel_l1, 8),
        "mel_l1_threshold": threshold,
        "timbre_max_abs_diff": round(timbre_md, 8),
        "source": source,
        "ckpt": ckpt,
        "pass": ok,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    add_args(p)
    raise SystemExit(main(p.parse_args()))
