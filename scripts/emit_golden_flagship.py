"""Emit the FLAGSHIP-width torch-side golden capsule (VERDICT r3 #5).

The pretrained-parity gate (`facodec_tpu validate`) has three comparison
sources; source 1 (`--golden` capsule) is the one that can run in any CI
without torch or the reference repo present. This script produces that
capsule at the released architecture's widths (reference
configs/config.yml:27-46) from a SEEDED random-weight torch reference model
— so the capsule + seed fully determine the comparison, and swapping in the
real `Plachta/FAcodec` checkpoint later is a one-command change
(`validate --ckpt pytorch_model.bin --config config.yml`).

    python scripts/emit_golden_flagship.py            # writes examples/golden_flagship.npz

The capsule stores codes_p/codes_c/codes_r, timbre, and the reconstructed
wave of a deterministic 1.2 s chirp (cli/validate._test_wave), ~150 KB.
tests/test_validate.py::test_validate_flagship_golden regenerates the same
seeded checkpoint and runs the full `--golden` gate against it.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SEED = 20240807  # reference snapshot date; shared with the test
SECONDS = 1.2

FLAGSHIP_CFG_TEXT = """
log_dir: "/tmp/facodec_golden_flagship"
preprocess_params:
  sr: 24000
model_params:
  causal: True
  lstm: 2
  norm_f0: True
  use_gr_content_f0: False
  use_gr_prosody_phone: False
  use_gr_timbre_prosody: False
  separate_prosody_encoder: True
  n_c_codebooks: 2
  timbre_norm: True
  use_gr_content_global_f0: True
  DAC:
    encoder_dim: 64
    encoder_rates: [2, 5, 5, 6]
    decoder_dim: 1536
    decoder_rates: [6, 5, 5, 2]
    sr: 24000
"""


def write_flagship_ckpt(out_dir: str):
    """Seeded random-weight flagship checkpoint in the HF pytorch_model.bin
    layout + its config.yml. Deterministic given (torch version, SEED)."""
    import torch
    import yaml

    from ref_stubs import install_reference

    install_reference()
    from modules.commons import build_model, recursive_munch

    os.makedirs(out_dir, exist_ok=True)
    config = os.path.join(out_dir, "config.yml")
    with open(config, "w") as f:
        f.write(FLAGSHIP_CFG_TEXT)
    torch.manual_seed(SEED)
    cfg = recursive_munch(yaml.safe_load(FLAGSHIP_CFG_TEXT))
    model = build_model(cfg.model_params, stage="codec")
    ckpt = os.path.join(out_dir, "pytorch_model.bin")
    torch.save({k: model[k].state_dict() for k in model}, ckpt)
    return ckpt, config


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(REPO, "examples",
                                                 "golden_flagship.npz"))
    p.add_argument("--workdir", default="/tmp/facodec_golden_flagship")
    args = p.parse_args(argv)

    ckpt, config = write_flagship_ckpt(args.workdir)

    from facodec_tpu.cli.validate import add_args, main as validate_main

    vp = argparse.ArgumentParser()
    add_args(vp)
    rc = validate_main(vp.parse_args([
        "--ckpt", ckpt, "--config", config,
        "--seconds", str(SECONDS), "--emit-golden", args.out,
    ]))
    if rc == 0:
        print(f"golden capsule written: {args.out}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
