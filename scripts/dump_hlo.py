"""Dump the optimized HLO of the flagship round trip (TPU backend) and
summarize the divide_add fusions (shapes + op mix) that dominate the
profile (scripts/profile_roundtrip.py)."""

from __future__ import annotations

import re
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from facodec_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

from bench import SR, HOP, _build_models, _roundtrip_fn  # noqa: E402


def main(batch=16, seconds=10.0):
    models, params = _build_models()
    T = (int(seconds * SR) // HOP) * HOP
    wave = jnp.zeros((batch, T), jnp.float32)
    compiled = jax.jit(_roundtrip_fn(models, "float32")).lower(params, wave).compile()
    txt = compiled.as_text()
    with open("/tmp/roundtrip_hlo.txt", "w") as f:
        f.write(txt)
    print("HLO dumped:", len(txt), "chars -> /tmp/roundtrip_hlo.txt")

    # list fusion computations whose name contains divide_add
    for m in re.finditer(r"^%?(fused_computation[^\s]*divide[^\s]*|[^\s]*divide_add[^\s]*) \([^)]*\) -> [^{]+\{", txt, re.M):
        print("DEF:", m.group(0)[:160])


if __name__ == "__main__":
    main()
