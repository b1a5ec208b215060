"""Summarize a JAX profiler trace: device time by HLO category.

Companion to `avtubes.cli.profile` (the reference has no profiler at all —
SURVEY §5).  Reads the Chrome-trace export the profiler writes next to the
xplane proto, keeps only device-lane events, and aggregates wall time by
the `hlo_category` XLA attaches to every op (convolution fusion, loop
fusion, select-and-scatter, data formatting, ...), plus the top individual
ops.  This is the tool behind DESIGN.md's "where the non-MFU time goes"
tables.

Usage:
    python -m avtubes.cli.profile --mode train3d --steps 5
    python scripts/summarize_trace.py /tmp/avtubes_trace [--top 12]
"""

from __future__ import annotations

import argparse
import collections
import gzip
import json
from pathlib import Path


def load_trace(logdir: str) -> dict:
    paths = sorted(Path(logdir).glob("plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {logdir}")
    with gzip.open(paths[-1]) as f:
        return json.load(f)


def device_pids(events: list[dict]) -> set[int]:
    return {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "device:" in e.get("args", {}).get("name", "")
    }


def summarize(trace: dict, top: int = 12) -> dict:
    ev = trace["traceEvents"]
    pids = device_pids(ev)
    by_cat = collections.Counter()
    by_op = collections.Counter()
    op_cat = {}
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in pids:
            continue
        cat = e.get("args", {}).get("hlo_category")
        if cat is None:  # step/queue aggregate lanes, not HLO ops
            continue
        dur = e.get("dur", 0.0)
        by_cat[cat] += dur
        by_op[e["name"]] += dur
        op_cat[e["name"]] = cat
        total += dur
    return {
        "total_device_ms": total / 1e3,
        "by_category": [
            {"category": c, "ms": round(d / 1e3, 2),
             "pct": round(100 * d / total, 1)}
            for c, d in by_cat.most_common()
        ],
        "top_ops": [
            {"op": n, "category": op_cat[n], "ms": round(d / 1e3, 2),
             "pct": round(100 * d / total, 1)}
            for n, d in by_op.most_common(top)
        ],
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("logdir")
    p.add_argument("--top", default=12, type=int)
    p.add_argument("--json", action="store_true",
                   help="print one JSON object instead of a table")
    a = p.parse_args(argv)
    s = summarize(load_trace(a.logdir), a.top)
    if a.json:
        print(json.dumps(s))
        return
    print(f"device HLO time: {s['total_device_ms']:.1f} ms "
          "(all profiled steps combined)")
    print("\nby category:")
    for r in s["by_category"]:
        print(f"  {r['pct']:5.1f}%  {r['ms']:9.2f} ms  {r['category']}")
    print(f"\ntop {a.top} ops:")
    for r in s["top_ops"]:
        print(f"  {r['pct']:5.1f}%  {r['ms']:9.2f} ms  {r['op']}  "
              f"[{r['category']}]")


if __name__ == "__main__":
    main()
