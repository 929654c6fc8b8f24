"""Fused Pallas VQ kernel vs the XLA reference path (interpret mode on CPU;
the same kernel runs compiled on TPU — exercised by bench.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from facodec_tpu.ops.pallas.vq import nearest_code_pallas
from facodec_tpu.ops.vq_math import nearest_code


def test_pallas_vq_matches_xla():
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal((2, 100, 8)), jnp.float32)
    cb = jnp.asarray(rng.standard_normal((1024, 8)), jnp.float32)

    idx_ref, zq_ref = nearest_code(lat, cb)
    idx, zq = nearest_code_pallas(lat, cb, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(zq), np.asarray(zq_ref), rtol=1e-6)


def test_pallas_vq_row_padding():
    """M not a tile multiple (padding path)."""
    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.standard_normal((7, 8)), jnp.float32)
    cb = jnp.asarray(rng.standard_normal((32, 8)), jnp.float32)
    idx_ref, zq_ref = nearest_code(lat, cb)
    idx, zq = nearest_code_pallas(lat, cb, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(zq), np.asarray(zq_ref), rtol=1e-6)


def test_pallas_vq_codebook_grad_matches_gather():
    """VJP: codebook grads equal the XLA take() grads; latent grads zero."""
    rng = np.random.default_rng(2)
    lat = jnp.asarray(rng.standard_normal((50, 4)), jnp.float32)
    cb = jnp.asarray(rng.standard_normal((16, 4)), jnp.float32)

    def loss_pallas(lat, cb):
        _, zq = nearest_code_pallas(lat, cb, interpret=True)
        return jnp.sum(jnp.sin(zq) * zq)

    def loss_xla(lat, cb):
        _, zq = nearest_code(lat, cb)
        return jnp.sum(jnp.sin(zq) * zq)

    gl_p, gc_p = jax.grad(loss_pallas, argnums=(0, 1))(lat, cb)
    gl_x, gc_x = jax.grad(loss_xla, argnums=(0, 1))(lat, cb)
    np.testing.assert_allclose(np.asarray(gc_p), np.asarray(gc_x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gl_p), np.asarray(gl_x), atol=1e-6)
