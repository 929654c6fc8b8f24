"""LS-GAN adversarial and feature-matching losses over discriminator fmaps.

Matches the inlined loss math in the reference training loop
(/root/reference/train.py:280-312; same math as dac/nn/loss.py:330-368):

  disc:  sum_d  mean(d(fake)[-1]^2) + mean((1 - d(real)[-1])^2)
  gen:   sum_d  mean((1 - d(fake)[-1])^2)
  feat:  sum_d sum_{j<last} L1(d(fake)[j], stop_grad(d(real)[j]))

Inputs are the list-of-fmap-lists returned by
facodec_tpu.models.discriminator.Discriminator.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp


def discriminator_loss(
    d_fake: List[List[jnp.ndarray]], d_real: List[List[jnp.ndarray]]
) -> jnp.ndarray:
    loss = 0.0
    # reductions upcast to f32: under bfloat16_act the fmaps arrive bf16,
    # and a bf16-accumulated mean over ~1e6 elements is not trustworthy
    for x_fake, x_real in zip(d_fake, d_real):
        loss = loss + jnp.mean(jnp.square(x_fake[-1].astype(jnp.float32)))
        loss = loss + jnp.mean(jnp.square(1.0 - x_real[-1].astype(jnp.float32)))
    return loss


def generator_adv_losses(
    d_fake: List[List[jnp.ndarray]], d_real: List[List[jnp.ndarray]]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (adversarial_loss, feature_matching_loss)."""
    loss_g = 0.0
    for x_fake in d_fake:
        loss_g = loss_g + jnp.mean(jnp.square(1.0 - x_fake[-1].astype(jnp.float32)))
    loss_feature = 0.0
    for f_list, r_list in zip(d_fake, d_real):
        for f, r in zip(f_list[:-1], r_list[:-1]):
            loss_feature = loss_feature + jnp.mean(
                jnp.abs(f.astype(jnp.float32)
                        - jax.lax.stop_gradient(r).astype(jnp.float32))
            )
    return loss_g, loss_feature
