"""Factorized vector quantization (ViT-VQGAN style) and residual VQ.

TPU-native re-design of the reference quantizers
(/root/reference/dac/nn/quantize.py:13-255):

  * NTC layout; the codebook search is a fused L2-normalize + (B*T, D) x
    (D, N) distance matmul + argmin (facodec_tpu/ops/vq_math.py).
  * Straight-through estimation via `lax.stop_gradient` composition.
  * The RVQ stage loop is a *static* Python loop (n_codebooks <= 3 in
    FAcodec) so XLA sees a fixed unrolled graph; per-sample quantizer
    dropout is a masked contribution, matching the reference's semantics
    where the residual is updated with the *unmasked* stage output.
  * All losses are per-sample means, reduced exactly like the reference
    (`mse.mean([1, 2])` then masked batch mean).
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from facodec_tpu.nn.basic import Embedding
from facodec_tpu.nn.conv import Conv1d
from facodec_tpu.ops.vq_math import nearest_code


class VectorQuantize(nn.Module):
    """Single factorized VQ stage: 1x1 in-proj to a low-dim code space,
    L2-normalized nearest-neighbor lookup, straight-through, 1x1 out-proj.

    Reference: dac/nn/quantize.py:13-94. Input/output (B, T, input_dim).
    """

    input_dim: int
    codebook_size: int
    codebook_dim: int

    def setup(self):
        # exact=True: the VQ projections are f32 islands under the bf16
        # precision policy (ops/precision.py) — in_proj feeds the normalized-
        # distance argmin and out_proj feeds the next RVQ stage's residual,
        # so both directly determine code indices. They are 1x1 convs between
        # 8 and input_dim channels: negligible FLOPs next to the codec convs.
        self.in_proj = Conv1d(
            self.input_dim, self.codebook_dim, 1, weight_norm=True, exact=True
        )
        self.out_proj = Conv1d(
            self.codebook_dim, self.input_dim, 1, weight_norm=True, exact=True
        )
        self.codebook = Embedding(self.codebook_size, self.codebook_dim)

    def __call__(self, z: jnp.ndarray):
        """Returns (z_q (B,T,D_in), commitment_loss (B,), codebook_loss (B,),
        indices (B,T), z_e (B,T,codebook_dim))."""
        z_e = self.in_proj(z)
        indices, z_q = self.decode_latents(z_e)

        commitment_loss = jnp.mean(
            jnp.square(z_e - jax.lax.stop_gradient(z_q)), axis=(1, 2)
        )
        codebook_loss = jnp.mean(
            jnp.square(z_q - jax.lax.stop_gradient(z_e)), axis=(1, 2)
        )

        z_q = z_e + jax.lax.stop_gradient(z_q - z_e)  # straight-through
        z_q = self.out_proj(z_q)
        return z_q, commitment_loss, codebook_loss, indices, z_e

    def embed_code(self, embed_id: jnp.ndarray) -> jnp.ndarray:
        return self.codebook(embed_id)

    def decode_code(self, embed_id: jnp.ndarray) -> jnp.ndarray:
        """(B, T) int codes -> (B, T, codebook_dim)."""
        return self.embed_code(embed_id)

    def decode_latents(self, latents: jnp.ndarray):
        """(B, T, D) -> (indices (B,T), z_q (B,T,D)) via normalized distance."""
        return nearest_code(latents, self.codebook.weight)


class ResidualVectorQuantize(nn.Module):
    """SoundStream-style residual VQ with per-sample quantizer dropout.

    Reference: dac/nn/quantize.py:97-255. The `n_quantizers` argument is a
    static int in eval (stages beyond it are skipped at trace time — separate
    jit specializations per n, which is cheap since n <= 3 in FAcodec); in
    training mode a per-sample random number of quantizers is drawn from the
    'dropout' RNG stream exactly like the reference (quantize.py:166-171).
    """

    input_dim: int = 512
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: Union[int, Tuple[int, ...]] = 8
    quantizer_dropout: float = 0.0

    def setup(self):
        dims = self.codebook_dim
        if isinstance(dims, int):
            dims = [dims] * self.n_codebooks
        self.quantizers = [
            VectorQuantize(self.input_dim, self.codebook_size, dims[i], name=f"quantizers_{i}")
            for i in range(self.n_codebooks)
        ]

    def __call__(
        self,
        z: jnp.ndarray,
        n_quantizers: Optional[int] = None,
        train: bool = False,
    ):
        """(B, T, D) -> (z_q, codes (B,N,T), latents (B,T,N*dim),
        commitment_loss scalar, codebook_loss scalar)."""
        B = z.shape[0]
        z_q = jnp.zeros_like(z)
        residual = z
        commitment_loss = 0.0
        codebook_loss = 0.0
        codebook_indices = []
        latents = []

        if n_quantizers is None:
            n_quantizers = self.n_codebooks

        if train:
            # per-sample stage count: full for most, random 1..N for the
            # first `B * quantizer_dropout` samples (reference :166-171).
            rng = self.make_rng("dropout")
            nq = jnp.full((B,), self.n_codebooks + 1, dtype=jnp.float32)
            dropout = jax.random.randint(rng, (B,), 1, self.n_codebooks + 1).astype(
                jnp.float32
            )
            n_dropout = int(B * self.quantizer_dropout)
            if n_dropout > 0:
                nq = nq.at[:n_dropout].set(dropout[:n_dropout])
            n_active = self.n_codebooks
        else:
            nq = jnp.full((B,), float(n_quantizers), dtype=jnp.float32)
            n_active = min(int(n_quantizers), self.n_codebooks)

        for i, quantizer in enumerate(self.quantizers):
            if not train and i >= n_active:
                break
            z_q_i, commit_i, cb_i, indices_i, z_e_i = quantizer(residual)
            mask = (jnp.full((B,), float(i)) < nq).astype(z.dtype)
            z_q = z_q + z_q_i * mask[:, None, None]
            # reference updates the residual with the *unmasked* output
            residual = residual - z_q_i
            commitment_loss = commitment_loss + jnp.mean(commit_i * mask)
            codebook_loss = codebook_loss + jnp.mean(cb_i * mask)
            codebook_indices.append(indices_i)
            latents.append(z_e_i)

        codes = jnp.stack(codebook_indices, axis=1)  # (B, N, T)
        latents = jnp.concatenate(latents, axis=-1)  # (B, T, sum dims)
        return z_q, codes, latents, commitment_loss, codebook_loss

    def from_codes(self, codes: jnp.ndarray):
        """(B, N, T) codes -> (z_q (B,T,D), z_p (B,T,sum dims), codes)."""
        z_q = 0.0
        z_p = []
        n_codebooks = codes.shape[1]
        for i in range(n_codebooks):
            z_p_i = self.quantizers[i].decode_code(codes[:, i, :])
            z_p.append(z_p_i)
            z_q = z_q + self.quantizers[i].out_proj(z_p_i)
        return z_q, jnp.concatenate(z_p, axis=-1), codes

    def from_latents(self, latents: jnp.ndarray):
        """(B, T, sum dims) projected latents -> quantized representation."""
        z_q = 0.0
        z_p = []
        codes = []
        dims = [0]
        for q in self.quantizers:
            dims.append(dims[-1] + q.codebook_dim)
        n_codebooks = max(i for i in range(len(dims)) if dims[i] <= latents.shape[-1])
        for i in range(n_codebooks):
            j, k = dims[i], dims[i + 1]
            idx, z_p_i = self.quantizers[i].decode_latents(latents[:, :, j:k])
            z_p.append(z_p_i)
            codes.append(idx)
            z_q = z_q + self.quantizers[i].out_proj(z_p_i)
        return z_q, jnp.concatenate(z_p, axis=-1), jnp.stack(codes, axis=1)
