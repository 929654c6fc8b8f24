"""HF Hub checkpoint download (reference hf_utils.py:6-10).

Downloads the released `Plachta/FAcodec` / `Plachta/FAcodec-redecoder`
torch checkpoints (pytorch_model.bin + config.yml) into ./checkpoints and
returns the local paths; the torch->JAX conversion happens inside
FACodec.from_config. Gated: raises a clear error when huggingface_hub or
network egress is unavailable."""

from __future__ import annotations

import os
from typing import Tuple


def load_custom_model_from_hf(
    repo_id: str,
    model_filename: str = "pytorch_model.bin",
    config_filename: str = "config.yml",
    local_dir: str = "./checkpoints",
) -> Tuple[str, str]:
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:
        raise RuntimeError(
            "huggingface_hub is not installed; download "
            f"{repo_id}/{model_filename} and {config_filename} manually and "
            "pass their paths to FACodec.from_config"
        ) from e
    os.makedirs(local_dir, exist_ok=True)
    model_path = hf_hub_download(repo_id=repo_id, filename=model_filename,
                                 local_dir=local_dir)
    config_path = hf_hub_download(repo_id=repo_id, filename=config_filename,
                                  local_dir=local_dir)
    return model_path, config_path


def load_pretrained_codec(local_dir: str = "./checkpoints"):
    """FACodec from the released `Plachta/FAcodec` (reconstruct.py:19-39)."""
    from facodec_tpu.api import FACodec

    ckpt, cfg = load_custom_model_from_hf("Plachta/FAcodec", local_dir=local_dir)
    return FACodec.from_config(cfg, ckpt)


def load_pretrained_redecoder(local_dir: str = "./checkpoints"):
    """FARedecoder from `Plachta/FAcodec-redecoder`."""
    from facodec_tpu.api import FARedecoder

    ckpt, cfg = load_custom_model_from_hf("Plachta/FAcodec-redecoder",
                                          local_dir=local_dir)
    return FARedecoder.from_config(cfg, ckpt)
