"""Batch-1 round-trip RTF A/B: stacked vs pipelined 2-layer SLSTM scans.

VERDICT r3 weak #3: batch-1 RTF is 208x vs 491x at batch 16, and the gap is
almost entirely fixed sequential cost — the encoder + decoder SLSTMs run
2 layers x ~800 scan steps each at ~7 us/step regardless of batch, ~22 ms
that batch 16 amortizes 16 ways but batch 1 eats whole. The diagonal
wavefront (nn/lstm.lstm_2layer_pipelined) halves the sequential depth; this
measures it on the path where that depth dominates.

    python scripts/bench_batch1_lstm.py [seconds]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from facodec_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import bench  # noqa: E402  (repo-root bench.py: reuses its timing harness)
from facodec_tpu.ops.fused import enable_pipelined_lstm  # noqa: E402


def main(seconds: float = 10.0):
    models, params = bench._build_models()
    out = {"metric": "batch1_rtf_lstm_ab", "seconds": seconds}
    for tag, on in (("stacked", False), ("pipelined", True)):
        enable_pipelined_lstm(on)
        try:
            rtf, dt = bench._timed_rtf(models, params, 1, seconds, "hybrid")
        finally:
            enable_pipelined_lstm(False)
        out[f"rtf_{tag}"] = round(rtf, 2)
        out[f"ms_{tag}"] = round(dt * 1e3, 2)
        print(f"{tag:9s}: {rtf:7.2f}x RT  ({dt*1e3:.2f} ms / {seconds:.0f} s clip)",
              file=sys.stderr, flush=True)
    out["speedup"] = round(out["rtf_pipelined"] / out["rtf_stacked"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main(*[float(a) for a in sys.argv[1:]])
