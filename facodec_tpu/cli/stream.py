"""Streaming reconstruction CLI: process a wav through the EXACT chunked
streaming session (the real-time path), reporting per-chunk latency.

    python -m facodec_tpu stream --source in.wav [--output out.wav]
        [--chunk-frames 16] [--timbre-from ref.wav] [--ckpt-path ...]

With --timbre-from, the stream is timbre-conditioned on a reference
utterance (streaming zero-shot voice normalization); otherwise the source's
own timbre (computed in a prefix pass) is used.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def add_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--source", type=str, required=True)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--ckpt-path", type=str, default=None)
    p.add_argument("--config-path", type=str, default=None)
    p.add_argument("--chunk-frames", type=int, default=16)
    p.add_argument("--n-c", type=int, default=2)
    p.add_argument("--timbre-from", type=str, default=None)


def main(args: argparse.Namespace) -> str:
    import jax.numpy as jnp

    from facodec_tpu.api import FACodec
    from facodec_tpu.cli._io import DEFAULT_CONFIG, load_wav, save_wav
    from facodec_tpu.models.streaming import StreamingFACodec

    codec = FACodec.from_config(
        args.config_path or DEFAULT_CONFIG, args.ckpt_path, n_c=args.n_c
    )
    wave = load_wav(args.source)
    hop, C = 300, args.chunk_frames
    step = C * hop
    T = len(wave) // step * step
    wave = wave[:T]

    timbre_src = load_wav(args.timbre_from) if args.timbre_from else wave
    timbre = jnp.asarray(codec.timbre_of(timbre_src))

    sess = StreamingFACodec(
        codec.models["encoder"], codec.models["quantizer"],
        codec.models["decoder"], codec.params, chunk_frames=C, n_c=args.n_c,
    )
    est, dst = sess.init_encode_state(1), sess.init_decode_state(1)
    out, lat = [], []
    w = jnp.asarray(wave)[None]
    for i in range(0, T, step):
        t0 = time.perf_counter()
        # fused encode+decode: one device dispatch per chunk
        est, dst, y, codes = sess.roundtrip_chunk(est, dst, w[:, i : i + step], timbre)
        if y is None:  # small chunks buffer until the priming step
            continue
        y = np.asarray(y)  # forces completion (real-time consumer boundary)
        lat.append(time.perf_counter() - t0)
        out.append(y)
    outs_t, _ = sess.flush_encode(est, timbre)
    dst, y = sess.decode_chunk(dst, outs_t)
    out.append(np.asarray(y))

    recon = np.concatenate(out, axis=1)[0]
    dst_path = args.output or os.path.join(
        "reconstructed", "stream_" + os.path.basename(args.source)
    )
    save_wav(dst_path, recon)
    warm = lat[2:] if len(lat) > 3 else lat
    print(f"{dst_path} (chunk {step / 24000 * 1e3:.0f} ms, p50 latency "
          f"{np.percentile(warm, 50) * 1e3:.1f} ms over {len(lat)} chunks)")
    return dst_path


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    add_args(p)
    main(p.parse_args())
