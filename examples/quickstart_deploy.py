"""Quickstart: the deployment path — export an AOT artifact, serve it, hit it.

    # 1. export StableHLO programs for the signature you deploy
    python -m facodec_tpu export --out artifact/ --batch 4 --seconds 1 \
        --ckpt-path checkpoints/pytorch_model.bin [--platforms tpu]

    # 2. serve the artifact (no model source / config / tracing at runtime)
    python -m facodec_tpu serve --artifact artifact/ \
        --ckpt-path checkpoints/pytorch_model.bin --port 8080

    # 3. clients
    curl -X POST --data-binary @in.wav  http://localhost:8080/reconstruct -o out.wav
    curl -X POST --data-binary @in.wav  http://localhost:8080/encode -o out.fac
    curl -X POST --data-binary @out.fac http://localhost:8080/decode -o back.wav

This script does all three in-process (random weights unless --ckpt is
given): export -> ArtifactService -> HTTP round trip, printing the health
stats — including the micro-batcher's device-call count, which is the
serving-throughput story (concurrent same-bucket requests stack into one
device call; batch 1 underfills the chip).
"""

import argparse
import json
import os
import sys
import tempfile
import threading
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="/root/reference/configs/config.yml")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny CPU config (environment smoke test)")
    ap.add_argument("--seconds", type=float, default=1.0)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.config = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests", "tiny_config.yml",
        )

    from facodec_tpu.api import FACodec
    from facodec_tpu.cli.serve import ArtifactService, make_server, write_wav_bytes
    from facodec_tpu.utils.cache import enable_compile_cache
    from facodec_tpu.utils.export import export_codec

    enable_compile_cache()
    codec = FACodec.from_config(args.config, args.ckpt)

    art = tempfile.mkdtemp(prefix="facodec_artifact_")
    sizes = export_codec(codec, art, batch=args.batch, seconds=args.seconds)
    print(f"exported {len(sizes)} programs to {art}: "
          + ", ".join(f"{k} {v//1024} KiB" for k, v in sizes.items()))

    service = ArtifactService(art, codec.params)
    print(f"warmup: {service.warmup():.1f}s")
    server = make_server(service, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    sr = 24000
    t = np.arange(int(args.seconds * sr)) / sr
    wav = write_wav_bytes((0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32))
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/reconstruct", data=wav, method="POST"
    )
    out = urllib.request.urlopen(req).read()
    print(f"POST /reconstruct: {len(out)} bytes of WAV back")
    health = json.loads(
        urllib.request.urlopen(f"http://127.0.0.1:{port}/health").read()
    )
    print("health:", json.dumps(health))
    server.shutdown()
    server.server_close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
