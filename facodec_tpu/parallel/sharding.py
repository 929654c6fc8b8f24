"""Parameter sharding rules: tensor parallelism for the wide layers.

The reference is DDP-only (SURVEY.md §2.4); data parallelism replicates
every parameter. On a (data, model) mesh this module additionally shards the
genuinely wide parameters over the `model` axis — the 20000-way speaker
head, the 1024-way phone heads and the 2048-wide timbre projection — and
lets the SPMD partitioner insert the all-gathers/reduce-scatters. Everything
else stays replicated: the codec's convs are small enough that TP would be
all communication.

Usage:
    shardings = tp_param_shardings(params, mesh)
    params = jax.tree.map(jax.device_put, params, shardings)
    # then jit the step as usual — XLA propagates the shardings
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from facodec_tpu.parallel.mesh import MODEL_AXIS


def _flatten_with_paths(tree, prefix=()):
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out += _flatten_with_paths(v, prefix + (k,))
    else:
        out.append((prefix, tree))
    return out


def tp_param_shardings(
    params: Any,
    mesh: Mesh,
    min_elems: int = 1 << 20,
) -> Any:
    """Pytree of NamedShardings matching `params`: 2-D `weight` params with
    >= min_elems elements and an output dim divisible by the model-axis size
    are sharded P('model', None) (torch Linear layout (out, in)); everything
    else is replicated. With model axis size 1 this is pure DP."""
    n_model = mesh.shape[MODEL_AXIS]
    repl = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P(MODEL_AXIS))

    def rule(path: Tuple[str, ...], x) -> NamedSharding:
        if n_model <= 1 or not hasattr(x, "shape"):
            return repl
        if (
            len(path) >= 1
            and path[-1] == "weight"
            and getattr(x, "ndim", 0) == 2
            and x.size >= min_elems
            and x.shape[0] % n_model == 0
        ):
            return NamedSharding(mesh, P(MODEL_AXIS, None))
        if (
            len(path) >= 1
            and path[-1] == "bias"
            and getattr(x, "ndim", 0) == 1
            and x.shape[0] >= 4096
            and x.shape[0] % n_model == 0
        ):
            return row
        return repl

    flat = _flatten_with_paths(params)
    shardings = {}
    for path, x in flat:
        node = shardings
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = rule(path, x)
    return shardings


def apply_shardings(params: Any, shardings: Any) -> Any:
    return jax.tree.map(lambda x, s: jax.device_put(x, s), params, shardings)


def describe_shardings(shardings: Any) -> Dict[str, str]:
    """Human-readable map of the non-replicated params (for logging)."""
    out = {}
    for path, s in _flatten_with_paths(shardings):
        if s.spec != P():
            out["/".join(path)] = str(s.spec)
    return out
