"""Torch-checkpoint conversion and Orbax-style native checkpointing.

The reference ships checkpoints as torch state_dicts (HF `pytorch_model.bin`
holding one state_dict per module, reference reconstruct.py:30-34; training
checkpoints hold them under a 'net' key with optional DDP 'module.' prefixes,
reference modules/commons.py:446-471). Because every flax module in this
framework stores parameters in the torch layout under names that mirror the
torch module tree, conversion is a pure *key* rewrite — no tensor math:

  torch `block.1.block.0.block.1.conv.conv.weight_v`
    -> flax path ('block_1', 'block_0', 'block_1', 'weight_v')

Rules:
  * numeric path components merge into the preceding name (`block.1` ->
    `block_1`), covering nn.Sequential / ModuleList indices;
  * the `conv`/`convtr` wrapper levels of the reference's SConv1d /
    NormConv1d / SConvTranspose1d collapse away (our layers hold the weight
    directly);
  * fixed DSP buffers (kaiser `filter` taps, `to_mel` window/fbank) are
    dropped — they are compile-time constants here;
  * modern parametrized weight-norm keys (`parametrizations.weight.original0/1`)
    normalize to the legacy `weight_g`/`weight_v` the reference uses.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

__all__ = [
    "torch_key_to_path",
    "convert_state_dict",
    "convert_model_dict",
    "load_torch_checkpoint_file",
]

_DROP_TOKENS = ("conv", "convtr")


def torch_key_to_path(key: str) -> Optional[Tuple[str, ...]]:
    """Map a flat torch state_dict key to a flax param path, or None to skip."""
    if key.startswith("module."):
        key = key[len("module.") :]
    if key.endswith(".filter"):
        return None
    if key.startswith("to_mel.") or ".to_mel." in key:
        return None
    key = key.replace("parametrizations.weight.original0", "weight_g")
    key = key.replace("parametrizations.weight.original1", "weight_v")
    out = []
    for tok in key.split("."):
        if tok in _DROP_TOKENS:
            continue
        if tok.isdigit() and out:
            out[-1] = f"{out[-1]}_{tok}"
        else:
            out.append(tok)
    return tuple(out)


def _to_numpy(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):  # torch tensor without importing torch
        return t.detach().cpu().numpy()
    return np.asarray(t)


def convert_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Flat torch state_dict -> nested flax params dict (numpy leaves)."""
    params: Dict[str, Any] = {}
    for key, val in sd.items():
        path = torch_key_to_path(key)
        if path is None:
            continue
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = _to_numpy(val)
    return params


def _flatten(tree: Mapping, prefix=()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def validate_against(
    converted: Mapping[str, Any], template: Mapping[str, Any], name: str = ""
) -> None:
    """Raise with a readable diff if converted params don't line up 1:1 in
    path and shape with an `init_params` template."""
    got = _flatten(converted)
    want = _flatten(template)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    msgs = []
    if missing:
        msgs.append(f"missing {len(missing)}: " + ", ".join("/".join(p) for p in missing[:8]))
    if extra:
        msgs.append(f"unexpected {len(extra)}: " + ", ".join("/".join(p) for p in extra[:8]))
    for p in set(got) & set(want):
        gs, ws = tuple(np.shape(got[p])), tuple(np.shape(want[p]))
        if gs != ws:
            msgs.append(f"shape mismatch at {'/'.join(p)}: ckpt {gs} vs model {ws}")
    if msgs:
        raise ValueError(f"checkpoint conversion failed for {name or 'model'}:\n  " + "\n  ".join(msgs))


def convert_model_dict(
    torch_ckpt: Mapping[str, Mapping[str, Any]],
    templates: Optional[Mapping[str, Any]] = None,
) -> Dict[str, Any]:
    """Convert {module_name: state_dict} (the HF `pytorch_model.bin` layout)
    into {module_name: flax params}. If a training checkpoint is passed
    (with a 'net' key), unwrap it first. Validates against `templates`
    (an `init_params` output) when given."""
    if "net" in torch_ckpt and isinstance(torch_ckpt["net"], Mapping):
        torch_ckpt = torch_ckpt["net"]
    out: Dict[str, Any] = {}
    for name, sd in torch_ckpt.items():
        if not isinstance(sd, Mapping):
            continue
        out[name] = convert_state_dict(sd)
        if templates is not None and name in templates:
            validate_against(out[name], templates[name], name)
    return out


def load_torch_checkpoint_file(
    path: str, templates: Optional[Mapping[str, Any]] = None
) -> Dict[str, Any]:
    """Load a torch-saved checkpoint file and convert (requires torch)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    return convert_model_dict(ckpt, templates)


def export_state_dict(
    params: Mapping[str, Any], torch_keys: "list[str]"
) -> Dict[str, np.ndarray]:
    """Inverse conversion: flax params -> flat torch state_dict (numpy
    values), given the torch model's key list (e.g. from the original
    pytorch_model.bin). `torch_key_to_path` defines the bijection, so every
    architectural key maps back exactly; dropped buffer keys (filters,
    to_mel) are skipped — torch recomputes them at module init."""
    flat = _flatten(params)
    out: Dict[str, np.ndarray] = {}
    missing = []
    for key in torch_keys:
        path = torch_key_to_path(key)
        if path is None:
            continue
        if path in flat:
            out[key] = np.asarray(flat[path])
        else:
            missing.append(key)
    if missing:
        raise ValueError(
            f"export: {len(missing)} torch keys have no flax param: "
            + ", ".join(missing[:8])
        )
    return out
