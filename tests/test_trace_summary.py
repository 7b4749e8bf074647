"""tools/trace_summary.py aggregation: device-lane filtering, envelope
separation, and the --attr family rollup (FLOP/byte rates) on a
synthetic Perfetto trace."""

import gzip
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import trace_summary  # noqa: E402


def _write_trace(d):
    ev = [
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "python host"}},
        # device fusions: two of one family, one of another
        {"ph": "X", "pid": 7, "name": "fusion.1", "dur": 1000, "ts": 0,
         "args": {"model_flops": 2e9, "raw_bytes_accessed": 1e6}},
        {"ph": "X", "pid": 7, "name": "fusion.2", "dur": 3000, "ts": 0,
         "args": {"model_flops": 6e9, "raw_bytes_accessed": 3e6}},
        {"ph": "X", "pid": 7, "name": "my_kernel.9", "dur": 500, "ts": 0,
         "args": {"model_flops": 1e9}},
        # envelopes: the program span, the scan loop, a bare run counter
        {"ph": "X", "pid": 7, "name": "jit_chained", "dur": 9999, "ts": 0},
        {"ph": "X", "pid": 7, "name": "while.4", "dur": 9000, "ts": 0},
        {"ph": "X", "pid": 7, "name": "2", "dur": 8000, "ts": 0},
        # host-lane event with a device-looking name: must be ignored
        {"ph": "X", "pid": 9, "name": "fusion.1", "dur": 77777, "ts": 0},
    ]
    os.makedirs(os.path.join(d, "plugins"), exist_ok=True)
    p = os.path.join(d, "plugins", "x.trace.json.gz")
    with gzip.open(p, "wt") as f:
        json.dump({"traceEvents": ev}, f)
    return p


def test_summarize_filters_and_aggregates(tmp_path):
    _write_trace(str(tmp_path))
    agg, env, fam = trace_summary.summarize(str(tmp_path))
    # per-name: host lane excluded, envelopes excluded
    assert agg["fusion.1"] == [1000.0, 1]
    assert agg["fusion.2"] == [3000.0, 1]
    assert "jit_chained" in env and "while.4" in env and "2" in env
    assert "2" not in agg  # bare run counters are envelopes, not fusions
    # family rollup sums time, count, flops, bytes
    us, cnt, fl, by = fam["fusion"]
    assert (us, cnt) == (4000.0, 2)
    assert fl == 8e9 and by == 4e6
    assert fam["my_kernel"][:2] == [500.0, 1]


def test_attr_cli_prints_rates(tmp_path):
    _write_trace(str(tmp_path))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "trace_summary.py"),
         str(tmp_path), "--attr", "--per-iter", "2"],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    fusion_row = next(l for l in lines if l.rstrip().endswith("  fusion"))
    cols = fusion_row.split()
    # 4000 us over 2 iters = 2.0 ms/iter; 8 GFLOP / 4 ms = 2.0 TFLOP/s
    assert float(cols[0]) == 2.0
    assert float(cols[4]) == 2.0
    assert any("TOTAL" in l for l in lines)


def test_diff_cli_aligns_two_traces(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    _write_trace(str(a))
    _write_trace(str(b))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "trace_summary.py"),
         str(a), "--diff", str(b)],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    row = next(l for l in lines if l.rstrip().endswith("fusion.2"))
    cols = row.split()
    # identical traces: A == B == 3.0 ms, delta +0.000
    assert float(cols[0]) == 3.0 and float(cols[1]) == 3.0
    assert cols[2] == "+0.000"
    assert any("TOTAL" in l for l in lines)
