"""End-to-end test of the pretrained-parity gate (`facodec_tpu validate`)
with a random-weight torch checkpoint — the exact flow to run against the
released `Plachta/FAcodec` the moment egress is available (VERDICT r1 #3).

Uses a reference-exact-width config (the reference build_model hard-codes
the 1024-wide quantizer, modules/commons.py:296-309) with small DAC conv
dims to keep CPU time down.
"""

import argparse
import json
import os

import numpy as np
import pytest
import torch

from ref_stubs import install_reference

install_reference()

CFG_TEXT = """
log_dir: "/tmp/facodec_validate_test"
preprocess_params:
  sr: 24000
model_params:
  causal: True
  lstm: 1
  norm_f0: True
  use_gr_content_f0: False
  use_gr_prosody_phone: False
  use_gr_timbre_prosody: False
  separate_prosody_encoder: True
  n_c_codebooks: 2
  timbre_norm: True
  use_gr_content_global_f0: True
  DAC:
    encoder_dim: 4
    encoder_rates: [2, 5, 5, 6]
    decoder_dim: 32
    decoder_rates: [6, 5, 5, 2]
    sr: 24000
"""


@pytest.fixture(scope="module")
def ckpt_and_config(tmp_path_factory):
    """Random-weight torch checkpoint in the HF pytorch_model.bin layout."""
    import yaml
    from modules.commons import build_model, recursive_munch

    d = tmp_path_factory.mktemp("validate")
    config = str(d / "config.yml")
    with open(config, "w") as f:
        f.write(CFG_TEXT)

    torch.manual_seed(11)
    cfg = recursive_munch(yaml.safe_load(CFG_TEXT))
    model = build_model(cfg.model_params, stage="codec")
    ckpt = str(d / "pytorch_model.bin")
    torch.save({k: model[k].state_dict() for k in model}, ckpt)
    return ckpt, config


def _run(args_list):
    from facodec_tpu.cli.validate import add_args, main

    p = argparse.ArgumentParser()
    add_args(p)
    return main(p.parse_args(args_list))


def test_validate_live_torch(ckpt_and_config, capsys, tmp_path):
    ckpt, config = ckpt_and_config
    # random-weight decoders emit near-silence, where the normalized log-mel
    # is hypersensitive; the 1e-3 default threshold targets the real
    # checkpoint — codes_bit_exact is the hard assertion here
    rc = _run(["--ckpt", ckpt, "--config", config, "--seconds", "0.8",
               "--mel-threshold", "0.05"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["codes_bit_exact"] is True
    assert out["source"] == "live-torch"
    assert out["mel_l1"] < 0.05
    assert rc == 0 and out["pass"] is True


def test_validate_golden_roundtrip(ckpt_and_config, capsys, tmp_path):
    """--emit-golden then --golden reproduces the live-torch verdict."""
    ckpt, config = ckpt_and_config
    golden = str(tmp_path / "golden.npz")
    rc = _run(["--ckpt", ckpt, "--config", config, "--seconds", "0.8",
               "--emit-golden", golden])
    assert rc == 0 and os.path.exists(golden)
    capsys.readouterr()

    rc = _run(["--ckpt", ckpt, "--config", config, "--seconds", "0.8",
               "--golden", golden, "--mel-threshold", "0.05"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["codes_bit_exact"] is True
    assert out["source"] == "golden-file"
    assert rc == 0

    # a corrupted golden must FAIL the gate
    g = dict(np.load(golden))
    g["codes_c"] = g["codes_c"] + 1
    np.savez(golden, **g)
    rc = _run(["--ckpt", ckpt, "--config", config, "--seconds", "0.8",
               "--golden", golden, "--mel-threshold", "0.05"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["codes_bit_exact"] is False
    assert rc == 1


@pytest.mark.slow
def test_validate_flagship_golden(capsys, tmp_path):
    """The checked-in FLAGSHIP-width golden capsule (VERDICT r3 #5): the
    full `--golden` gate executes at the released architecture's widths
    today, against the seeded random-weight checkpoint the capsule was
    emitted from (scripts/emit_golden_flagship.py). Swapping in the real
    `Plachta/FAcodec` checkpoint later changes only the --ckpt path.

    A failure here after a torch upgrade means the seeded weights drifted —
    regenerate with `python scripts/emit_golden_flagship.py`."""
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    golden = os.path.join(repo, "examples", "golden_flagship.npz")
    assert os.path.exists(golden), "run scripts/emit_golden_flagship.py"
    _sys.path.insert(0, os.path.join(repo, "scripts"))
    from emit_golden_flagship import SECONDS, write_flagship_ckpt

    ckpt, config = write_flagship_ckpt(str(tmp_path))
    rc = _run(["--ckpt", ckpt, "--config", config, "--seconds", str(SECONDS),
               "--golden", golden, "--mel-threshold", "0.05"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["source"] == "golden-file"
    assert out["codes_bit_exact"] is True
    assert rc == 0 and out["pass"] is True
