"""Gradient golden parity vs the torch reference — pins the straight-through
estimator, the RVQ loss masking, and forward_v2's detach discipline
(stop_gradient placement), which output-only tests cannot see."""

import numpy as np
import torch

from ref_stubs import install_reference

install_reference()

import jax
import jax.numpy as jnp

from facodec_tpu.utils.checkpoint import convert_state_dict


def _t(x):
    return torch.from_numpy(np.asarray(x))


def test_vq_grads_match_torch():
    """d(commit + codebook + sum(z_q))/d{input, in_proj, codebook} identical:
    straight-through + detach placement (dac/nn/quantize.py:56-66)."""
    from dac.nn.quantize import VectorQuantize as TVQ

    from facodec_tpu.models.quantize import VectorQuantize

    torch.manual_seed(0)
    ref = TVQ(input_dim=16, codebook_size=8, codebook_dim=4).train()
    x = torch.randn(2, 16, 6, requires_grad=True)

    z_q, commit, cb, idx, z_e = ref(x)
    loss_t = commit.mean() + cb.mean() + z_q.sum()
    loss_t.backward()

    mod = VectorQuantize(input_dim=16, codebook_size=8, codebook_dim=4)
    params = convert_state_dict(ref.state_dict())

    def loss_fn(params, xj):
        z_q, commit, cb, idx, z_e = mod.apply({"params": params}, xj)
        return jnp.mean(commit) + jnp.mean(cb) + jnp.sum(z_q)

    xj = jnp.asarray(x.detach().numpy()).transpose(0, 2, 1)
    g_params, g_x = jax.grad(loss_fn, argnums=(0, 1))(params, xj)

    np.testing.assert_allclose(
        np.transpose(np.asarray(g_x), (0, 2, 1)), x.grad.numpy(),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(g_params["codebook"]["weight"]),
        ref.codebook.weight.grad.numpy(), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(g_params["in_proj"]["weight_v"]),
        ref.in_proj.weight_v.grad.numpy(), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(g_params["out_proj"]["weight_v"]),
        ref.out_proj.weight_v.grad.numpy(), rtol=1e-4, atol=1e-5,
    )


def test_rvq_train_mode_parity_no_dropout():
    """Train-mode RVQ with quantizer_dropout=0: per-sample mask all-active,
    losses unmasked (dac/nn/quantize.py:166-190) — outputs AND grads."""
    from dac.nn.quantize import ResidualVectorQuantize as TRVQ

    from facodec_tpu.models.quantize import ResidualVectorQuantize

    torch.manual_seed(1)
    ref = TRVQ(input_dim=16, n_codebooks=3, codebook_size=8, codebook_dim=4,
               quantizer_dropout=0.0).train()
    x = torch.randn(2, 16, 5, requires_grad=True)
    z_q, codes, latents, commit, cb = ref(x)
    (commit + cb + z_q.sum()).backward()

    mod = ResidualVectorQuantize(input_dim=16, n_codebooks=3, codebook_size=8,
                                 codebook_dim=4, quantizer_dropout=0.0)
    params = convert_state_dict(ref.state_dict())

    def loss_fn(params, xj):
        z_q, codes_j, lat, commit_j, cb_j = mod.apply(
            {"params": params}, xj, train=True,
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        return commit_j + cb_j + jnp.sum(z_q), codes_j

    xj = jnp.asarray(x.detach().numpy()).transpose(0, 2, 1)
    (loss_val, codes_j), g_x = jax.value_and_grad(loss_fn, argnums=1, has_aux=True)(
        params, xj
    )
    np.testing.assert_array_equal(np.asarray(codes_j), codes.numpy())
    np.testing.assert_allclose(
        float(loss_val),
        float(commit + cb + z_q.sum()), rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(g_x), (0, 2, 1)), x.grad.numpy(),
        rtol=1e-4, atol=1e-5,
    )


def test_forward_v2_detach_discipline():
    """d(sum(outs))/dx through forward_v2: prosody/content streams are
    detached into `outs` and the residual input subtracts detached copies
    (quantize.py:401-417) — the input grad must match torch exactly."""
    from modules.quantize import FAquantizer as TFA

    from facodec_tpu.models.fa_quantizer import FAquantizer

    torch.manual_seed(2)
    kw = dict(in_dim=64, n_p_codebooks=1, n_c_codebooks=2, n_t_codebooks=2,
              n_r_codebooks=3, codebook_size=16, codebook_dim=4,
              quantizer_dropout=0.0, causal=True,
              separate_prosody_encoder=False, timbre_norm=False)
    ref = TFA(**kw).eval()  # v1 path (timbre_norm=False avoids the 1024 tie)
    x = torch.randn(2, 64, 4, requires_grad=True)
    wave = 0.3 * torch.randn(2, 1, 1200)
    flags = torch.ones(2, dtype=torch.bool)
    outs, q, commit, cb = ref(x, wave, flags, flags, n_c=2, n_t=2)
    (outs.sum() + commit.mean() + cb.mean()).backward()

    mod = FAquantizer(**kw)
    params = {"params": convert_state_dict(ref.state_dict())}

    def loss_fn(xj):
        outs, q, commit_j, cb_j = mod.apply(
            params, xj, jnp.asarray(wave[:, 0].numpy()),
            noise_added_flags=jnp.ones(2, bool),
            recon_noisy_flags=jnp.ones(2, bool), n_c=2, n_t=2,
        )
        return jnp.sum(outs) + jnp.mean(commit_j) + jnp.mean(cb_j)

    xj = jnp.asarray(x.detach().numpy()).transpose(0, 2, 1)
    g_x = jax.grad(loss_fn)(xj)
    np.testing.assert_allclose(
        np.transpose(np.asarray(g_x), (0, 2, 1)), x.grad.numpy(),
        rtol=2e-3, atol=1e-4,
    )
