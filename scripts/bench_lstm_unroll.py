"""Batch-1 round-trip RTF vs LSTM scan unroll factor.

Round-4 finding (CLAUDE.md): at batch 1 the decoder SLSTM is
weight-streaming-bound — w_hh (1536ch, 18.9 MB bf16) overflows the 16 MB
VMEM and XLA reloads ~|w_hh|/unroll per scan step, so the unroll factor
sets the recurrent-weight HBM traffic. This sweeps FACODEC_LSTM_UNROLL
(nn/lstm._scan_unroll, trace-time) over the batch-1 headline point.

    python scripts/bench_lstm_unroll.py [seconds] [unrolls...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

from facodec_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import bench  # noqa: E402


def main(seconds: float = 10.0, *unrolls: float):
    unrolls = [int(u) for u in unrolls] or [8, 16, 32, 64]
    models, params = bench._build_models()
    out = {"metric": "batch1_rtf_vs_lstm_unroll", "seconds": seconds,
           "rtf": {}}
    for u in unrolls:
        os.environ["FACODEC_LSTM_UNROLL"] = str(u)
        try:
            rtf, dt = bench._timed_rtf(models, params, 1, seconds, "hybrid")
        finally:
            os.environ.pop("FACODEC_LSTM_UNROLL", None)
        out["rtf"][u] = round(rtf, 2)
        print(f"unroll {u:3d}: {rtf:7.2f}x RT  ({dt*1e3:.2f} ms / "
              f"{seconds:.0f} s clip)", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main(*[float(a) for a in sys.argv[1:]])
