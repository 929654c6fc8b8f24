"""Serving throughput bench: requests/s through CodecService with and
without cross-request micro-batching.

Fires `--requests` concurrent 1 s reconstruct requests from `--threads`
client threads at the flagship codec (tiny config with --tiny for CPU
smoke). Reports wall-clock requests/s and the device-call count — the
micro-batcher's win is visible as fewer device calls than requests
(bench.py batch curve: 210x RTF at batch 1 vs 490x at batch 16, so stacked
calls should approach the batched-throughput ceiling).

Usage: python scripts/bench_serve.py [--tiny] [--max-batch 8] [--requests 64]
"""

from __future__ import annotations

import argparse
import sys
import threading
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SR, HOP = 24000, 300


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="tiny config on CPU")
    ap.add_argument("--config", default="/root/reference/configs/config.yml")
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--threads", type=int, default=16)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--batch-window-ms", type=float, default=5.0)
    ap.add_argument("--seconds", type=float, default=1.0, help="request length")
    args = ap.parse_args()

    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.config = "/root/repo/tests/tiny_config.yml"

    from facodec_tpu.api import FACodec
    from facodec_tpu.cli.serve import CodecService
    from facodec_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    codec = FACodec.from_config(
        args.config, precision="float32" if args.tiny else "hybrid"
    )

    rng = np.random.default_rng(0)
    T = int(args.seconds * SR) // HOP * HOP
    waves = [
        (0.3 * np.sin(2 * np.pi * (150 + 10 * i) * np.arange(T) / SR)
         + 0.01 * rng.standard_normal(T)).astype(np.float32)
        for i in range(args.threads)
    ]

    results = {}
    for max_batch in (1, args.max_batch):
        svc = CodecService(
            codec, bucket_seconds=args.seconds, max_batch=max_batch,
            batch_window_ms=args.batch_window_ms,
        )
        svc.warmup()
        # pre-compile EVERY power-of-two batch program the batcher can emit
        # (partial bursts pad to intermediate sizes; a compile inside the
        # timed region would corrupt the steady-state req/s)
        Tb = svc.bucket_frames * HOP
        row = np.zeros(Tb, np.float32)
        n = 2
        while n <= max_batch:
            svc._run_batch(("reconstruct", Tb), [(row, Tb)] * n)
            n *= 2

        n_left = [args.requests]
        lock = threading.Lock()

        def client(i):
            while True:
                with lock:
                    if n_left[0] <= 0:
                        return
                    n_left[0] -= 1
                svc.reconstruct(waves[i % len(waves)])

        t0 = time.perf_counter()
        threads = [
            threading.Thread(target=client, args=(i,)) for i in range(args.threads)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        results[max_batch] = dict(
            rps=args.requests / dt,
            device_calls=svc._batcher.calls,
            max_batch_seen=svc._batcher.max_seen,
        )
        print(
            f"max_batch={max_batch:2d}: {args.requests / dt:7.2f} req/s "
            f"({svc._batcher.calls} device calls, "
            f"largest stack {svc._batcher.max_seen})"
        )
        svc._batcher.close()

    if args.max_batch > 1:
        speedup = results[args.max_batch]["rps"] / results[1]["rps"]
        print(f"micro-batching speedup: {speedup:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
