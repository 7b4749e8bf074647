"""Summarize a jax.profiler device trace into a per-fusion time table.

The reference's observability is wall-clock timers (main.cpp:28,55-64);
this is the TPU-side deep view the round logs have been producing ad hoc:
aggregate the Perfetto trace.json.gz a `bench.py --profile DIR` run
writes, and print per-fusion device totals — the tool behind every
"where the ms go" table in docs/TUNING.md.

Usage:
    python tools/trace_summary.py /tmp/prof_dir [--top 20] [--per-iter N]
    python tools/trace_summary.py a_dir --diff b_dir   # A/B two traces

--per-iter divides by the chain length (bench.py runs scan-chained
forwards, so per-fusion totals are N iterations of the model; N =
chain x runs, printed by bench.py). --diff aligns two summaries by
fusion name (XLA numbers fusions deterministically for the same program,
so A/B runs of the same config align; renamed fusions show as +/-).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def find_trace(d: str) -> str:
    cands = sorted(
        glob.glob(os.path.join(d, "**", "*.trace.json.gz"), recursive=True)
    )
    if not cands:
        raise SystemExit(f"no *.trace.json.gz under {d}")
    return cands[-1]  # latest capture


def summarize(d: str):
    """name -> (total_us, count) over device-lane complete events.

    Container events (the jit_* program span and while.* scan loops)
    enclose the fusions and would double-count — they are split out and
    returned separately as the program envelope."""
    path = find_trace(d)
    data = json.loads(gzip.open(path).read())
    dev_pids = {
        e["pid"]
        for e in data["traceEvents"]
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    agg: dict = collections.defaultdict(lambda: [0.0, 0])
    envelope: dict = collections.defaultdict(lambda: [0.0, 0])
    # family -> [us, count, model_flops, bytes_accessed] (xprof per-event
    # metadata; FLOPs are XLA's cost model incl. Pallas CostEstimate)
    fam: dict = collections.defaultdict(lambda: [0.0, 0, 0.0, 0.0])
    for e in data["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e["name"]
        bucket = (
            envelope
            if name.startswith(("jit_", "while")) or name.isdigit()
            else agg
        )
        b = bucket[name]
        b[0] += e.get("dur", 0)
        b[1] += 1
        if bucket is agg:
            args = e.get("args", {})
            f = fam[name.rsplit(".", 1)[0]]
            f[0] += e.get("dur", 0)
            f[1] += 1
            f[2] += float(args.get("model_flops", 0) or 0)
            f[3] += float(args.get("raw_bytes_accessed", 0) or 0)
    return agg, envelope, fam


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dir", help="profile dir (bench.py --profile DIR)")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument(
        "--per-iter", type=int, default=None,
        help="divide by N model iterations (bench chain x runs)",
    )
    ap.add_argument("--diff", default=None, help="second dir to A/B")
    ap.add_argument(
        "--attr", action="store_true",
        help="attribute by fusion FAMILY (name minus the .N suffix) with "
        "XLA-cost-model FLOP and HBM rates — the speed-of-light check per "
        "component (model_flops counts NOMINAL work: the masked-width "
        "Pallas kernels issue 2x that)",
    )
    args = ap.parse_args()

    agg, env, fam = summarize(args.dir)
    if args.attr:
        scale = 1.0 / (args.per_iter or 1)
        unit = "ms/iter" if args.per_iter else "ms"
        total = sum(v[0] for v in fam.values())
        print(
            f"{unit:>10} {'share':>6} {'x':>5} {'GFLOP':>8} {'TFLOP/s':>8} "
            f"{'GB':>7} {'GB/s':>7}  family"
        )
        for name, (us, cnt, fl, by) in sorted(
            fam.items(), key=lambda kv: -kv[1][0]
        )[: args.top]:
            rate = fl / (us * 1e6) if us else 0.0  # FLOP/us -> TFLOP/s
            bw = by / (us * 1e3) if us else 0.0  # B/us -> GB/s
            print(
                f"{us / 1e3 * scale:10.3f} {us / total * 100:5.1f}% "
                f"{cnt * scale:5.0f} {fl / 1e9 * scale:8.1f} {rate:8.1f} "
                f"{by / 1e9 * scale:7.2f} {bw:7.0f}  {name[:48]}"
            )
        print(f"{total / 1e3 * scale:10.3f}  TOTAL (device fusion time)")
        return 0
    total = sum(v[0] for v in agg.values())
    scale = 1.0 / (args.per_iter or 1)
    unit = "ms/iter" if args.per_iter else "ms"

    if args.diff:
        agg_b, _, _ = summarize(args.diff)
        total_b = sum(v[0] for v in agg_b.values())
        names = sorted(
            set(agg) | set(agg_b),
            key=lambda n: -(agg.get(n, [0])[0] + agg_b.get(n, [0])[0]),
        )
        print(f"{'A ' + unit:>12} {'B ' + unit:>12} {'delta':>8}  fusion")
        for n in names[: args.top]:
            a = agg.get(n, [0.0, 0])[0] / 1e3 * scale
            b = agg_b.get(n, [0.0, 0])[0] / 1e3 * scale
            print(f"{a:12.3f} {b:12.3f} {b - a:+8.3f}  {n[:70]}")
        print(
            f"{total / 1e3 * scale:12.3f} {total_b / 1e3 * scale:12.3f} "
            f"{(total_b - total) / 1e3 * scale:+8.3f}  TOTAL (device fusion time)"
        )
        return 0

    for name, (us, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[
        : args.top
    ]:
        print(
            f"{us / 1e3 * scale:9.3f} {unit}  x{cnt:6d} "
            f"{us / total * 100:5.1f}%  {name[:70]}"
        )
    print(f"{total / 1e3 * scale:9.3f} {unit}  TOTAL (device fusion time)")
    for name, (us, cnt) in sorted(env.items(), key=lambda kv: -kv[1][0])[:3]:
        print(f"[envelope] {us / 1e3 * scale:9.3f} {unit}  x{cnt}  {name[:60]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
