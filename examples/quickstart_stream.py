"""Quickstart: live real-time streaming over TCP — the serving path behind
the reference's "can be used for real-time voice conversion" claim
(reference README.md:105-107, which ships no live transport).

    # server: HTTP inference + a live duplex PCM stream listener
    python -m facodec_tpu serve --config-path configs/config.yml \
        --ckpt-path checkpoints/pytorch_model.bin \
        --port 8080 --stream-port 8081 \
        [--redecoder-config configs/config_redecoder.yml \
         --redecoder-ckpt checkpoints/redecoder.bin]

    # client protocol (cli/stream_serve.py): one JSON header line, then
    # <u32 len><f32le PCM> frames; zero-length frame = end. The server
    # answers with output frames at one-chunk latency (50 ms chunks at
    # chunk_frames=4).

This script does it in-process on random weights (--tiny for the test
config): starts the server, then

  1. streams a tone through live RECONSTRUCTION (self-timbre from the
     causal prefix),
  2. streams it again as zero-shot VC under a target utterance's timbre
     (header "timbre_wav"),
  3. if a redecoder is configured, streams VC through the REDECODER
     resynthesis route (header "vc_mode": "redecoder"),
  4. runs three concurrent streams to show CONTINUOUS BATCHING: slots of
     one BatchedStreamGroup advance in a single masked device call per
     tick (/metrics facodec_stream_* gauges).
"""

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR, HOP = 24000, 300


def tone(seconds, hz=220.0, seed=0):
    t = np.arange(int(seconds * SR)) / SR
    rng = np.random.default_rng(seed)
    return (0.4 * np.sin(2 * np.pi * hz * t)
            + 0.02 * rng.standard_normal(len(t))).astype(np.float32)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="/root/reference/configs/config.yml")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="use the small test config (fast compile)")
    ap.add_argument("--chunk-frames", type=int, default=4)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon TPU plugin "
                    "ignores JAX_PLATFORMS)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.tiny:
        args.config = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", "tests", "tiny_config.yml")

    from facodec_tpu.api import FACodec, FARedecoder
    from facodec_tpu.cli.serve import CodecService, write_wav_bytes
    from facodec_tpu.cli.stream_serve import (StreamingService,
                                              make_stream_server, stream_wav)

    print(f"building codec from {args.config} ...")
    codec = FACodec.from_config(args.config, args.ckpt)
    redecoder = None
    if args.tiny:  # the tiny config doubles as a causal redecoder config
        redecoder = FARedecoder.from_config(args.config)
    service = CodecService(codec, redecoder, bucket_seconds=0.5)
    streaming = StreamingService(service)  # continuous batching on (cap 8)
    server = make_stream_server(streaming, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    print(f"live streaming on tcp://127.0.0.1:{port}")

    C = args.chunk_frames
    sess = streaming.session(C)
    n_chunks = sess.prime_frames // C + 6
    source = tone(n_chunks * C * HOP / SR, hz=196.0, seed=1)
    target_blob = write_wav_bytes(tone(0.5, hz=330.0, seed=2))

    # 1. live reconstruction (self-timbre)
    t0 = time.time()
    out, status = stream_wav("127.0.0.1", port, source, chunk_frames=C)
    print(f"reconstruction: {len(source)} in -> {len(out)} out in "
          f"{time.time() - t0:.1f}s (prime {status['prime_samples']} samples, "
          f"chunk {C * HOP / SR * 1e3:.0f} ms)")

    # 2. zero-shot VC via codec timbre swap
    out_vc, _ = stream_wav("127.0.0.1", port, source, chunk_frames=C,
                           timbre_wav_bytes=target_blob)
    print(f"timbre-swap VC: differs from reconstruction: "
          f"{not np.allclose(out, out_vc)}")

    # 3. VC through the redecoder resynthesis route
    if redecoder is not None:
        out_red, st = stream_wav("127.0.0.1", port, source, chunk_frames=C,
                                 timbre_wav_bytes=target_blob,
                                 vc_mode="redecoder")
        print(f"redecoder VC: {len(out_red)} samples "
              f"(redecoder prime {st['redecoder_prime_frames']} frames)")

    # 4. concurrent streams share device ticks (continuous batching)
    outs = [None] * 3

    def worker(i):
        outs[i] = stream_wav("127.0.0.1", port,
                             tone(len(source) / SR, hz=180 + 60 * i, seed=5 + i),
                             chunk_frames=C)[0]

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    disp = streaming.dispatcher(C)
    print(f"3 concurrent streams in {time.time() - t0:.1f}s — "
          f"{disp.ticks} ticks, up to {disp.max_stacked} streams per device "
          f"call")
    for g in streaming.group_stats().values():
        print("group stats:", json.dumps(g))
    server.shutdown()
    server.server_close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
