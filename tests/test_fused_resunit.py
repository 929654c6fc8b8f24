"""Fused Pallas residual unit (ops/pallas/resunit.py) vs the XLA composition.

Runs in interpret mode on CPU (the kernel auto-selects interpret off-TPU);
the same code path compiles with Mosaic on the real chip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from facodec_tpu.models.dac import ResidualUnit
from facodec_tpu.ops.fused import enable_fused


@pytest.fixture(autouse=True)
def _reset_flag():
    yield
    enable_fused(False)


def _random_params(rng, unit, x):
    return unit.init(rng, x)["params"]


@pytest.mark.parametrize("dilation", [1, 3, 9])
@pytest.mark.parametrize("causal", [True, False])
def test_fused_matches_xla(dilation, causal):
    C, B, T = 64, 2, 4800
    unit = ResidualUnit(C, dilation=dilation, causal=causal)
    rng = jax.random.PRNGKey(0)
    x = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (B, T, C), jnp.float32)
    enable_fused(False)
    params = _random_params(rng, unit, x)
    want = unit.apply({"params": params}, x)

    enable_fused(True)
    got = unit.apply({"params": params}, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_tail_not_multiple_of_tile():
    """T that is not a multiple of the VMEM tile exercises the host-side
    zero pad + slice."""
    C, B, T = 96, 1, 5000
    unit = ResidualUnit(C, dilation=3, causal=True)
    x = 0.5 * jax.random.normal(jax.random.PRNGKey(2), (B, T, C), jnp.float32)
    enable_fused(False)
    params = _random_params(jax.random.PRNGKey(0), unit, x)
    want = unit.apply({"params": params}, x)
    enable_fused(True)
    got = unit.apply({"params": params}, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_gradients_match():
    """custom_vjp backward == grads of the XLA composition."""
    C, B, T = 64, 1, 4800
    unit = ResidualUnit(C, dilation=1, causal=True)
    x = 0.5 * jax.random.normal(jax.random.PRNGKey(3), (B, T, C), jnp.float32)
    enable_fused(False)
    params = _random_params(jax.random.PRNGKey(0), unit, x)

    def loss(p, x, flag):
        enable_fused(flag)
        y = unit.apply({"params": p}, x)
        return jnp.sum(jnp.sin(y))

    gp_ref, gx_ref = jax.grad(lambda p, x: loss(p, x, False), argnums=(0, 1))(params, x)
    gp_fus, gx_fus = jax.grad(lambda p, x: loss(p, x, True), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx_fus), np.asarray(gx_ref),
                               rtol=5e-4, atol=1e-5)
    for k in gp_ref:
        for kk in gp_ref[k]:
            np.testing.assert_allclose(
                np.asarray(gp_fus[k][kk]), np.asarray(gp_ref[k][kk]),
                rtol=5e-4, atol=1e-5, err_msg=f"{k}/{kk}")


def test_ineligible_shapes_fall_back():
    """Small T and wide channels stay on the XLA path (flag on, no crash,
    identical results — it IS the XLA path)."""
    enable_fused(True)
    unit = ResidualUnit(512, dilation=1, causal=True)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 40, 512), jnp.float32)
    params = unit.init(jax.random.PRNGKey(0), x)["params"]
    y = unit.apply({"params": params}, x)
    assert y.shape == x.shape
