"""The factorized quantizer — the core of FAcodec — plus its supervision /
disentanglement predictor heads.

TPU-native rebuild of /root/reference/modules/quantize.py:
  * `FAquantizer` (:156-454): prosody / content / residual RVQ streams, a
    WaveNet prosody encoder over the first 20 mel bins, a StyleEncoder timbre
    vector, residual-stream random masking, and AdaIN-style timbre injection
    (LayerNorm * gamma + beta from `timbre_linear(timbre)`).
  * `CNNLSTM` heads (:106-125) built from alias-free SnakeBeta residual units.
  * `FApredictors` (:456-606): f0/uv, phone and speaker predictors over the
    quantized streams with gradient-reversal adversarial branches.

All stochastic behavior (residual mask p=0.75, RVQ quantizer dropout, conv
dropout) draws from the flax 'dropout' RNG stream — explicit keys instead of
global RNG state, as required for reproducible pjit training.

Layout: latents (B, T, C); waves (B, Tw); mels (B, Tf, n_mels).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from facodec_tpu.models.quantize import ResidualVectorQuantize
from facodec_tpu.models.style_encoder import StyleEncoder
from facodec_tpu.models.wavenet import WN
from facodec_tpu.nn.activations import SnakeBeta
from facodec_tpu.nn.alias_free import Activation1d
from facodec_tpu.nn.basic import LayerNorm, Linear
from facodec_tpu.nn.conv import Conv1d, SConv1d
from facodec_tpu.ops.gradrev import gradient_reversal
from facodec_tpu.ops.spectral import log_mel_spectrogram


def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_length) bool mask (commons.py:131-135)."""
    x = jnp.arange(max_length)
    return x[None, :] < lengths[:, None]


class ResidualUnitAF(nn.Module):
    """Alias-free residual unit used by CNNLSTM heads
    (reference modules/quantize.py:92-104): Activation1d(SnakeBeta) ->
    dilated 7-tap WN conv -> Activation1d(SnakeBeta) -> 1x1 WN conv."""

    dim: int = 16
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = ((7 - 1) * self.dilation) // 2
        y = Activation1d(snake_features=self.dim, name="block_0")(x)
        y = Conv1d(self.dim, self.dim, 7, dilation=self.dilation, padding=pad,
                   weight_norm=True, name="block_1")(y)
        y = Activation1d(snake_features=self.dim, name="block_2")(y)
        y = Conv1d(self.dim, self.dim, 1, weight_norm=True, name="block_3")(y)
        return x + y


class CNNLSTM(nn.Module):
    """Conv head with N linear outputs (reference modules/quantize.py:106-125).
    Despite the name there is no LSTM — it is 3 alias-free residual units.
    Input (B, T, C); outputs are (B, T, outdim) or (B, outdim) if global."""

    indim: int
    outdim: int
    head: int
    global_pred: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        x = ResidualUnitAF(self.indim, dilation=1, name="model_0")(x)
        x = ResidualUnitAF(self.indim, dilation=2, name="model_1")(x)
        x = ResidualUnitAF(self.indim, dilation=3, name="model_2")(x)
        x = Activation1d(snake_features=self.indim, name="model_3")(x)
        if self.global_pred:
            x = jnp.mean(x, axis=1)
        outs = [
            Linear(self.indim, self.outdim, name=f"heads_{i}")(x)
            for i in range(self.head)
        ]
        return outs


class FAquantizer(nn.Module):
    """Factorized quantizer (reference modules/quantize.py:156-454).

    With `timbre_norm=True` (the released configuration) the forward pass is
    the reference's `forward_v2`: prosody stream from a separate WaveNet mel
    encoder, content RVQ on the encoder latent, residual RVQ on the
    difference, residual masking p=0.75 in training, and timbre injected as
    LayerNorm * gamma + beta. With `timbre_norm=False` the legacy 4-stream
    variant (prosody/content/timbre/residual RVQs) is used.
    """

    in_dim: int = 1024
    n_p_codebooks: int = 1
    n_c_codebooks: int = 2
    n_t_codebooks: int = 2
    n_r_codebooks: int = 3
    codebook_size: int = 1024
    codebook_dim: int = 8
    quantizer_dropout: float = 0.5
    causal: bool = False
    separate_prosody_encoder: bool = False
    timbre_norm: bool = False
    sample_rate: int = 24000
    hop_length: int = 300
    # widths the reference hard-codes (quantize.py:195, 211-213); the
    # defaults reproduce them exactly — override only for scaled-down tests
    style_hidden_dim: int = 512
    prosody_hidden_dim: int = 256

    prob_random_mask_residual: float = 0.75

    def setup(self):
        rvq = lambda n, name: ResidualVectorQuantize(
            input_dim=self.in_dim,
            n_codebooks=n,
            codebook_size=self.codebook_size,
            codebook_dim=self.codebook_dim,
            quantizer_dropout=self.quantizer_dropout,
            name=name,
        )
        self.prosody_quantizer = rvq(self.n_p_codebooks, "prosody_quantizer")
        self.content_quantizer = rvq(self.n_c_codebooks, "content_quantizer")
        self.residual_quantizer = rvq(self.n_r_codebooks, "residual_quantizer")
        d = self.in_dim  # reference hard-codes 1024 here; equal for in_dim=1024
        if not self.timbre_norm:
            self.timbre_quantizer = rvq(self.n_t_codebooks, "timbre_quantizer")
        else:
            self.timbre_encoder = StyleEncoder(
                in_dim=80, hidden_dim=self.style_hidden_dim, out_dim=d,
                name="timbre_encoder",
            )
            # bias init: gamma half -> 1, beta half -> 0 (reference :196-198)
            self.timbre_linear = Linear(
                d, d * 2, name="timbre_linear",
                bias_init=lambda rng, shape: jnp.concatenate(
                    [jnp.ones((d,)), jnp.zeros((d,))]
                ),
            )
            self.timbre_ln = LayerNorm(d, elementwise_affine=False, name="timbre_norm")
        if self.separate_prosody_encoder:
            h = self.prosody_hidden_dim
            self.melspec_linear = SConv1d(
                20, h, 1, causal=self.causal, norm="none", name="melspec_linear"
            )
            self.melspec_encoder = WN(
                hidden_channels=h, kernel_size=5, dilation_rate=1, n_layers=8,
                gin_channels=0, p_dropout=0.2, causal=self.causal,
                name="melspec_encoder",
            )
            self.melspec_linear2 = SConv1d(
                h, d, 1, causal=self.causal, norm="none", name="melspec_linear2"
            )

    # ------------------------------------------------------------------ mel
    def preprocess(self, wave: jnp.ndarray, n_bins: int = 20) -> jnp.ndarray:
        """(B, Tw) wave -> (B, Tw//hop, n_bins) normalized log-mel
        (reference quantize.py:239-242)."""
        mel = log_mel_spectrogram(
            wave, sample_rate=self.sample_rate, hop_length=self.hop_length
        )
        n_frames = wave.shape[-1] // self.hop_length
        return mel[:, :n_frames, :n_bins]

    def _prosody_features(self, wave_segments: jnp.ndarray, train: bool) -> jnp.ndarray:
        """Separate prosody encoder: 20-bin mel -> 1x1 -> WN(8) -> 1x1 -> 1024."""
        f0_input = self.preprocess(wave_segments, n_bins=20)
        f0_input = self.melspec_linear(f0_input)
        mask = jnp.ones((f0_input.shape[0], f0_input.shape[1], 1), f0_input.dtype)
        f0_input = self.melspec_encoder(f0_input, mask, train=train)
        return self.melspec_linear2(f0_input)

    # ------------------------------------------------------------- forward
    def __call__(self, x, wave_segments, **kwargs):
        if self.timbre_norm:
            return self.forward_v2(x, wave_segments, **kwargs)
        return self.forward_v1(x, wave_segments, **kwargs)

    def forward_v2(
        self,
        x: jnp.ndarray,
        wave_segments: jnp.ndarray,
        n_c: int = 1,
        n_t: int = 2,
        full_waves: Optional[jnp.ndarray] = None,
        wave_lens: Optional[jnp.ndarray] = None,
        return_codes: bool = False,
        train: bool = False,
    ):
        """timbre_norm path (reference quantize.py:375-454).

        x: encoder latent (B, T, in_dim); wave_segments: (B, Tw).
        Returns (outs, [z_p, z_c, z_r], commitment, codebook, timbre[, codes]).
        """
        if full_waves is None:
            mel = self.preprocess(wave_segments, n_bins=80)
            mask = jnp.ones((mel.shape[0], mel.shape[1], 1), mel.dtype)
            timbre = self.timbre_encoder(mel, mask, train=train)
        else:
            mel = self.preprocess(full_waves, n_bins=80)
            mask = sequence_mask(wave_lens // self.hop_length, mel.shape[1])
            timbre = self.timbre_encoder(
                mel, mask[:, :, None].astype(mel.dtype), train=train
            )

        if self.separate_prosody_encoder:
            f0_input = self._prosody_features(wave_segments, train)
            common_min_size = min(f0_input.shape[1], x.shape[1])
            f0_input = f0_input[:, :common_min_size]
            x = x[:, :common_min_size]
            z_p, codes_p, _, commit_p, cb_p = self.prosody_quantizer(
                f0_input, 1, train=train
            )
        else:
            z_p, codes_p, _, commit_p, cb_p = self.prosody_quantizer(x, 1, train=train)
        outs = jax.lax.stop_gradient(z_p)

        z_c, codes_c, _, commit_c, cb_c = self.content_quantizer(x, n_c, train=train)
        outs = outs + jax.lax.stop_gradient(z_c)

        residual_feature = x - jax.lax.stop_gradient(z_p) - jax.lax.stop_gradient(z_c)
        z_r, codes_r, _, commit_r, cb_r = self.residual_quantizer(
            residual_feature, 3, train=train
        )

        if train:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(
                rng, 1.0 - self.prob_random_mask_residual, (x.shape[0], 1, 1)
            ).astype(z_r.dtype)
        else:
            keep = jnp.ones((x.shape[0], 1, 1), z_r.dtype)
        outs = outs + z_r * keep

        quantized = [z_p, z_c, z_r]
        codes = [codes_p, codes_c, codes_r]
        commitment = commit_p + commit_c + commit_r
        codebook_l = cb_p + cb_c + cb_r

        outs = self._timbre_condition(outs, timbre)

        if return_codes:
            return outs, quantized, commitment, codebook_l, timbre, codes
        return outs, quantized, commitment, codebook_l, timbre

    def forward_v1(
        self,
        x: jnp.ndarray,
        wave_segments: jnp.ndarray,
        noise_added_flags: Optional[jnp.ndarray] = None,
        recon_noisy_flags: Optional[jnp.ndarray] = None,
        n_c: int = 2,
        n_t: int = 2,
        train: bool = False,
    ):
        """Legacy 4-stream variant (reference quantize.py:303-374)."""
        if self.separate_prosody_encoder:
            f0_input = self._prosody_features(wave_segments, train)
            common_min_size = min(f0_input.shape[1], x.shape[1])
            f0_input = f0_input[:, :common_min_size]
            x = x[:, :common_min_size]
            z_p, codes_p, _, commit_p, cb_p = self.prosody_quantizer(
                f0_input, 1, train=train
            )
        else:
            z_p, codes_p, _, commit_p, cb_p = self.prosody_quantizer(x, 1, train=train)
        outs = jax.lax.stop_gradient(z_p)

        z_c, codes_c, _, commit_c, cb_c = self.content_quantizer(x, n_c, train=train)
        outs = outs + jax.lax.stop_gradient(z_c)

        timbre_residual = x - jax.lax.stop_gradient(z_p) - jax.lax.stop_gradient(z_c)
        z_t, codes_t, _, commit_t, cb_t = self.timbre_quantizer(
            timbre_residual, n_t, train=train
        )
        outs = outs + z_t  # timbre is NOT detached (reference :340)

        residual_feature = timbre_residual - z_t
        z_r, codes_r, _, commit_r, cb_r = self.residual_quantizer(
            residual_feature, 3, train=train
        )

        if train:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(
                rng, 1.0 - self.prob_random_mask_residual, (x.shape[0], 1, 1)
            ).astype(z_r.dtype)
        else:
            keep = jnp.ones((x.shape[0], 1, 1), z_r.dtype)
        if noise_added_flags is not None and recon_noisy_flags is not None:
            must_on = noise_added_flags & recon_noisy_flags
            must_off = noise_added_flags & (~recon_noisy_flags)
            keep = jnp.where(must_on[:, None, None], 1.0, keep)
            keep = jnp.where(must_off[:, None, None], 0.0, keep)
        outs = outs + z_r * keep

        quantized = [z_p, z_c, z_t, z_r]
        commitment = commit_p + commit_c + commit_t + commit_r
        codebook_l = cb_p + cb_c + cb_t + cb_r
        return outs, quantized, commitment, codebook_l

    # ----------------------------------------------------------- inference
    def encode(self, x: jnp.ndarray, wave_segments: jnp.ndarray, n_c: int = 1):
        """Inference encode (reference quantize.py:257-302, 4-stream variant;
        for timbre_norm models use forward_v2 with return_codes=True)."""
        if self.separate_prosody_encoder:
            f0_input = self._prosody_features(wave_segments, train=False)
            common_min_size = min(f0_input.shape[1], x.shape[1])
            f0_input = f0_input[:, :common_min_size]
            x = x[:, :common_min_size]
            z_p, codes_p, _, _, _ = self.prosody_quantizer(f0_input, 1)
        else:
            z_p, codes_p, _, _, _ = self.prosody_quantizer(x, 1)
        z_c, codes_c, _, _, _ = self.content_quantizer(x, n_c)
        timbre_residual = x - z_p - z_c
        z_t, codes_t, _, _, _ = self.timbre_quantizer(timbre_residual, 2)
        residual = timbre_residual - z_t
        z_r, codes_r, _, _, _ = self.residual_quantizer(residual, 3)
        return [codes_c, codes_p, codes_t, codes_r], [z_c, z_p, z_t, z_r]

    def decode(self, codes: jnp.ndarray):
        """(B, 4, T) stacked [c, p, t0, t1] codes -> summed latent
        (reference quantize.py:244-254)."""
        code_c = codes[:, 0:1]
        code_p = codes[:, 1:2]
        code_t = codes[:, 2:4]
        z_c = self.content_quantizer.from_codes(code_c)[0]
        z_p = self.prosody_quantizer.from_codes(code_p)[0]
        z_t = self.timbre_quantizer.from_codes(code_t)[0]
        return z_c + z_p + z_t, [z_c, z_p, z_t]

    # ----------------------------------------------------------- streaming
    def _timbre_condition(self, outs: jnp.ndarray, timbre: jnp.ndarray) -> jnp.ndarray:
        """LayerNorm * gamma + beta AdaIN injection (reference :444-449)."""
        style = self.timbre_linear(timbre)
        gamma, beta = jnp.split(style, 2, axis=-1)
        outs = self.timbre_ln(outs)
        return outs * gamma[:, None, :] + beta[:, None, :]

    def encode_streaming(
        self,
        x: jnp.ndarray,
        mel20: jnp.ndarray,
        timbre: jnp.ndarray,
        wn_stream,
        n_c: int = 1,
        first: bool = False,
    ):
        """Frame-synchronous chunk encode (timbre_norm models, eval).

        x: (B, T, in_dim) encoder latent chunk; mel20: (B, T, 20) aligned
        normalized log-mel; timbre: (B, in_dim) fixed stream timbre vector;
        wn_stream: prosody WN conv carries. Matches forward_v2 eval exactly
        per frame. Returns (outs, [codes_p, codes_c, codes_r], new_wn_stream).
        """
        f0_input = self.melspec_linear(mel20)
        mask = jnp.ones((f0_input.shape[0], f0_input.shape[1], 1), f0_input.dtype)
        f0_input, new_wn = self.melspec_encoder(
            f0_input, mask, stream=wn_stream, first=first
        )
        f0_input = self.melspec_linear2(f0_input)
        z_p, codes_p, _, _, _ = self.prosody_quantizer(f0_input, 1)
        z_c, codes_c, _, _, _ = self.content_quantizer(x, n_c)
        z_r, codes_r, _, _, _ = self.residual_quantizer(x - z_p - z_c, 3)
        outs = self._timbre_condition(z_p + z_c + z_r, timbre)
        return outs, [codes_p, codes_c, codes_r], new_wn

    def decode_from_codes_v2(
        self, codes_p: jnp.ndarray, codes_c: jnp.ndarray,
        codes_r: Optional[jnp.ndarray], timbre: jnp.ndarray,
    ) -> jnp.ndarray:
        """(B, n, T) factorized code streams + timbre -> decoder-ready latent
        (timbre_norm models). codes_r=None drops the residual stream."""
        outs = self.prosody_quantizer.from_codes(codes_p)[0]
        outs = outs + self.content_quantizer.from_codes(codes_c)[0]
        if codes_r is not None:
            outs = outs + self.residual_quantizer.from_codes(codes_r)[0]
        return self._timbre_condition(outs, timbre)

    def decode_streams_v2(
        self, codes_p: jnp.ndarray, codes_c: jnp.ndarray,
        codes_r: Optional[jnp.ndarray], timbre: jnp.ndarray,
        use_p: bool = True, use_c: bool = True, use_r: bool = True,
    ) -> jnp.ndarray:
        """Decode an arbitrary subset of the factorized streams — the
        factorization-audit decode (reference train.py:428-466 does this
        with ad-hoc quantizer internals; here it is a first-class method
        powering both train-time probes and cli/evaluate's quantitative
        disentanglement numbers)."""
        parts = []
        if use_p:
            parts.append(self.prosody_quantizer.from_codes(codes_p)[0])
        if use_c:
            parts.append(self.content_quantizer.from_codes(codes_c)[0])
        if use_r and codes_r is not None:
            parts.append(self.residual_quantizer.from_codes(codes_r)[0])
        assert parts, "at least one stream must be selected"
        outs = parts[0]
        for p in parts[1:]:
            outs = outs + p
        return self._timbre_condition(outs, timbre)


class FApredictors(nn.Module):
    """Supervision + gradient-reversal disentanglement heads
    (reference modules/quantize.py:456-606)."""

    in_dim: int = 1024
    use_gr_content_f0: bool = False
    use_gr_prosody_phone: bool = False
    use_gr_residual_f0: bool = False
    use_gr_residual_phone: bool = False
    use_gr_timbre_content: bool = True
    use_gr_timbre_prosody: bool = True
    use_gr_x_timbre: bool = False
    norm_f0: bool = True
    timbre_norm: bool = False
    use_gr_content_global_f0: bool = False
    # class counts the reference hard-codes (quantize.py:459-506); defaults
    # reproduce them — override only for scaled-down tests
    n_phone_classes: int = 1024
    n_speakers: int = 20000

    def setup(self):
        self.f0_predictor = CNNLSTM(self.in_dim, 1, 2, name="f0_predictor")
        self.phone_predictor = CNNLSTM(
            self.in_dim, self.n_phone_classes, 1, name="phone_predictor"
        )
        if self.timbre_norm:
            self.timbre_predictor = Linear(
                self.in_dim, self.n_speakers, name="timbre_predictor"
            )
            self.global_f0_predictor = Linear(self.in_dim, 1, name="global_f0_predictor")
        else:
            self.timbre_predictor = CNNLSTM(
                self.in_dim, self.n_speakers, 1, global_pred=True, name="timbre_predictor"
            )
        self.rev_f0_predictor = CNNLSTM(self.in_dim, 1, 2, name="rev_f0_predictor_1")
        self.rev_content_predictor = CNNLSTM(
            self.in_dim, self.n_phone_classes, 1, name="rev_content_predictor_1"
        )
        self.rev_timbre_predictor = CNNLSTM(
            self.in_dim, self.n_speakers, 1, global_pred=True, name="rev_timbre_predictor_1"
        )
        if self.use_gr_content_global_f0:
            self.rev_global_f0_predictor = CNNLSTM(
                self.in_dim, 1, 1, global_pred=True, name="rev_global_f0_predictor_1"
            )

    def __call__(self, quantized, timbre=None):
        if self.timbre_norm:
            return self.forward_v2(quantized, timbre)
        return self.forward_v1(quantized)

    def forward_v2(self, quantized: List[jnp.ndarray], timbre: jnp.ndarray):
        """timbre_norm path (reference :564-606). quantized = [p, c, r]."""
        prosody_latent, content_latent, residual_latent = quantized
        content_pred = self.phone_predictor(content_latent)[0]
        spk_pred = self.timbre_predictor(timbre)
        f0_pred, uv_pred = self.f0_predictor(prosody_latent)

        prosody_rev = jnp.zeros_like(prosody_latent)
        if self.use_gr_content_f0:
            prosody_rev = prosody_rev + content_latent
        if self.use_gr_residual_f0:
            prosody_rev = prosody_rev + residual_latent
        rev_f0_pred, rev_uv_pred = self.rev_f0_predictor(gradient_reversal(prosody_rev))

        content_rev = jnp.zeros_like(content_latent)
        if self.use_gr_prosody_phone:
            content_rev = content_rev + prosody_latent
        if self.use_gr_residual_phone:
            content_rev = content_rev + residual_latent
        rev_content_pred = self.rev_content_predictor(gradient_reversal(content_rev))[0]

        timbre_rev = prosody_latent + content_latent + residual_latent
        if self.use_gr_x_timbre:
            x_spk_pred = self.rev_timbre_predictor(gradient_reversal(timbre_rev))[0]
        else:
            x_spk_pred = None

        preds = {"f0": f0_pred, "uv": uv_pred, "content": content_pred, "timbre": spk_pred}
        rev_preds = {
            "rev_f0": rev_f0_pred,
            "rev_uv": rev_uv_pred,
            "rev_content": rev_content_pred,
            "x_timbre": x_spk_pred,
        }
        return preds, rev_preds

    def forward_v1(self, quantized: List[jnp.ndarray]):
        """Legacy 4-stream path (reference :507-563). quantized = [p, c, t, r]."""
        prosody_latent, content_latent, timbre_latent, residual_latent = quantized
        content_pred = self.phone_predictor(content_latent)[0]
        if self.norm_f0:
            spk_pred = self.timbre_predictor(timbre_latent)[0]
            f0_pred, uv_pred = self.f0_predictor(prosody_latent)
        else:
            spk_pred = self.timbre_predictor(timbre_latent + prosody_latent)[0]
            f0_pred, uv_pred = self.f0_predictor(prosody_latent + timbre_latent)

        prosody_rev = jnp.zeros_like(prosody_latent)
        if self.use_gr_content_f0:
            prosody_rev = prosody_rev + content_latent
        if self.use_gr_timbre_prosody:
            prosody_rev = prosody_rev + timbre_latent
        if self.use_gr_residual_f0:
            prosody_rev = prosody_rev + residual_latent
        rev_f0_pred, rev_uv_pred = self.rev_f0_predictor(gradient_reversal(prosody_rev))

        content_rev = jnp.zeros_like(content_latent)
        if self.use_gr_prosody_phone:
            content_rev = content_rev + prosody_latent
        if self.use_gr_timbre_content:
            content_rev = content_rev + timbre_latent
        if self.use_gr_residual_phone:
            content_rev = content_rev + residual_latent
        rev_content_pred = self.rev_content_predictor(gradient_reversal(content_rev))[0]

        if self.norm_f0:
            timbre_rev = prosody_latent + content_latent + residual_latent
        else:
            timbre_rev = content_latent + residual_latent
        if self.use_gr_x_timbre:
            x_spk_pred = self.rev_timbre_predictor(gradient_reversal(timbre_rev))[0]
        else:
            x_spk_pred = None

        preds = {"f0": f0_pred, "uv": uv_pred, "content": content_pred, "timbre": spk_pred}
        rev_preds = {
            "rev_f0": rev_f0_pred,
            "rev_uv": rev_uv_pred,
            "rev_content": rev_content_pred,
            "x_timbre": x_spk_pred,
        }
        return preds, rev_preds
