"""YAML config loading with attribute-dict access.

Accepts the reference FAcodec `configs/config.yml` schema unchanged
(cf. /root/reference/modules/commons.py:473-478 `recursive_munch`), so a
pretrained checkpoint's config can drive this framework 1:1.
"""

from __future__ import annotations

from typing import Any

import yaml


class AttrDict(dict):
    """dict with attribute access (a stand-in for `munch.Munch`)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def get(self, key, default=None):
        return dict.get(self, key, default)


def recursive_attrdict(d: Any) -> Any:
    """Recursively convert nested dicts/lists into AttrDicts."""
    if isinstance(d, dict):
        return AttrDict((k, recursive_attrdict(v)) for k, v in d.items())
    if isinstance(d, (list, tuple)):
        return [recursive_attrdict(v) for v in d]
    return d


def load_config(path: str) -> AttrDict:
    with open(path, "r") as f:
        cfg = yaml.safe_load(f)
    return recursive_attrdict(cfg)
