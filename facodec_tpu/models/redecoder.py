"""Redecoder: resynthesis from (prosody codes, content codes, timbre vector),
enabling zero-shot voice conversion by swapping the timbre vector.

TPU-native rebuild of /root/reference/modules/redecoder.py:4-63 (the
'wavenet' encoder variant — the reference's 'mamba' variant references a
module absent from the repo and is non-functional there).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from facodec_tpu.models.wavenet import WN
from facodec_tpu.nn.basic import Embedding
from facodec_tpu.nn.conv import Conv1d


class Redecoder(nn.Module):
    """prosody/content code embeddings -> WN(16, conditioned on timbre) ->
    1x1 conv to the 1024-d latent consumed by the DAC decoder."""

    n_p_codebooks: int = 1
    n_c_codebooks: int = 2
    codebook_size: int = 1024
    embed_dim: int = 512
    n_layers: int = 16
    causal: bool = False
    p_dropout: float = 0.2
    gin_channels: int = 1024
    out_dim: int = 1024  # latent dim consumed by the DAC decoder

    def setup(self):
        self.encoder = WN(
            hidden_channels=self.embed_dim, kernel_size=5, dilation_rate=1,
            n_layers=self.n_layers, gin_channels=self.gin_channels,
            p_dropout=self.p_dropout, causal=self.causal, name="encoder",
        )
        self.conv_out = Conv1d(self.embed_dim, self.out_dim, 1, name="conv_out")
        self.prosody_embed = [
            Embedding(self.codebook_size, self.embed_dim, name=f"prosody_embed_{i}")
            for i in range(self.n_p_codebooks)
        ]
        self.content_embed = [
            Embedding(self.codebook_size, self.embed_dim, name=f"content_embed_{i}")
            for i in range(self.n_c_codebooks)
        ]

    def __call__(
        self,
        p_code: jnp.ndarray,
        c_code: jnp.ndarray,
        timbre_vec: jnp.ndarray,
        use_p_code: bool = True,
        use_c_code: bool = True,
        n_c: int = 2,
        train: bool = False,
        stream=None,
        first: bool = False,
    ):
        """p_code: (B, n_p, T) int; c_code: (B, n_c, T) int;
        timbre_vec: (B, 1024). Returns latent (B, T, 1024).

        Streaming (causal only): code-embedding lookup and conv_out are
        frame-local; `stream` carries the WN in_layers' conv left contexts
        (models/wavenet.py:98) — returns (latent, new_stream)."""
        B, _, T = p_code.shape
        x = jnp.zeros((B, T, self.embed_dim))
        if use_p_code:
            for i in range(self.n_p_codebooks):
                x = x + self.prosody_embed[i](p_code[:, i, :])
        if use_c_code:
            for i in range(n_c):
                x = x + self.content_embed[i](c_code[:, i, :])
        mask = jnp.ones((B, T, 1), x.dtype)
        g = timbre_vec[:, None, :]
        if stream is not None:
            x, new_stream = self.encoder(x, mask, g=g, train=train,
                                         stream=stream, first=first)
            return self.conv_out(x), new_stream
        x = self.encoder(x, mask, g=g, train=train)
        return self.conv_out(x)


def redecoder_stream_state(red: Redecoder, batch: int) -> dict:
    """Zero left-context carries for the redecoder's WN (k=5, dilation 1)."""
    return {
        f"in_layers_{i}": jnp.zeros((batch, 4, red.embed_dim))
        for i in range(red.n_layers)
    }
