"""Per-module optimizers: AdamW + per-step exponential LR decay + clipping.

Mirrors the reference MultiOptimizer (/root/reference/optimizers.py:72-108):
one AdamW per module with betas (0.9, 0.98), eps 1e-9, weight_decay 0.1, and
an ExponentialLR gamma=0.999996 stepped every iteration; gradient clipping by
global norm per module group (train.py:290 disc 10.0, :362-365 gen 1000.0).

In JAX this is a dict of optax transforms and states — the GAN loop updates
the 'discriminator' entry and the generator entries at different points of
the same jitted step, which is the functional equivalent of
`optimizer.step(key)`.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import optax

GEN_KEYS = ("encoder", "quantizer", "decoder", "fa_predictors")

__all__ = ["make_optimizer", "build_optimizers", "init_opt_states", "GEN_KEYS"]


def make_optimizer(
    base_lr: float = 1e-4,
    gamma: float = 0.999996,
    clip_norm: Optional[float] = None,
    b1: float = 0.9,
    b2: float = 0.98,
    eps: float = 1e-9,
    weight_decay: float = 0.1,
) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=base_lr, transition_steps=1, decay_rate=gamma
    )
    tx = [
        optax.adamw(
            learning_rate=schedule, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay
        )
    ]
    if clip_norm is not None:
        tx.insert(0, optax.clip_by_global_norm(clip_norm))
    return optax.chain(*tx)


def build_optimizers(
    model_keys,
    base_lr: float = 1e-4,
    gamma: float = 0.999996,
    disc_clip: float = 10.0,
    gen_clip: float = 1000.0,
) -> Dict[str, optax.GradientTransformation]:
    """One transform per module, with the reference's clip norms."""
    out = {}
    for key in model_keys:
        clip = disc_clip if key == "discriminator" else gen_clip
        out[key] = make_optimizer(base_lr, gamma, clip_norm=clip)
    return out


def init_opt_states(
    optimizers: Mapping[str, optax.GradientTransformation],
    params: Mapping[str, Any],
) -> Dict[str, Any]:
    return {k: optimizers[k].init(params[k]) for k in optimizers}
