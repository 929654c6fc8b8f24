"""FAcodec-TPU: a TPU-native (JAX / XLA / Pallas / pjit) factorized audio codec framework.

A from-scratch rebuild of the capabilities of the FAcodec reference
(NaturalSpeech 3 factorized codec): a 24 kHz causal convolutional
encoder/decoder whose latent is factorized into prosody / content / residual
discrete code streams plus a continuous global timbre vector, trained with GAN
discriminators and gradient-reversal disentanglement predictors, plus a
redecoder for zero-shot voice conversion.

Everything here is designed TPU-first:
  * NTC (batch, time, channels) layouts so convs tile onto the MXU,
  * pure functional modules (flax.linen) under `jax.jit` / `pjit`,
  * `lax.scan` recurrences, static shapes, explicit RNG,
  * `jax.sharding.Mesh` data/model parallelism over ICI,
  * Pallas kernels for the memory-bound hot ops.
"""

__version__ = "0.1.0"

from facodec_tpu.utils.config import AttrDict, load_config, recursive_attrdict  # noqa: F401

_LAZY = {
    "FACodec": "facodec_tpu.api",
    "FARedecoder": "facodec_tpu.api",
    "convert_voice": "facodec_tpu.api",
    "FACodecFile": "facodec_tpu.codec_file",
    "StreamingFACodec": "facodec_tpu.models.streaming",
    "build_model": "facodec_tpu.models.builder",
    "init_params": "facodec_tpu.models.builder",
}


def __getattr__(name):  # PEP 562: heavy model/API imports stay lazy
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module 'facodec_tpu' has no attribute {name!r}")
