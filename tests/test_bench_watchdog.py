"""bench.py watchdog: the driver must ALWAYS get one valid headline JSON
line, even when every measurement leg times out (round-4 failure mode:
BENCH_r04.json rc=124, parsed=null).

The drill sets FACODEC_BENCH_TIMEOUT_S=1 so both the full child and the
capped fallback die instantly; bench.py must then print the persisted
last-good result tagged stale within seconds.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_watchdog_emits_stale_last_good_under_1s_cap():
    env = dict(os.environ, FACODEC_BENCH_TIMEOUT_S="1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=60, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, out.stdout
    result = json.loads(lines[0])
    assert result["metric"] == "encode_decode_rtf"
    assert result["unit"] == "x_realtime"
    assert isinstance(result["value"], (int, float)) and result["value"] > 0
    assert result["stale"] is True


def test_last_good_seed_is_checked_in_and_valid():
    path = os.path.join(REPO, ".bench_last_good.json")
    with open(path) as f:
        result = json.load(f)
    assert result["metric"] == "encode_decode_rtf"
    assert isinstance(result["value"], (int, float)) and result["value"] > 0
