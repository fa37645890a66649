#!/usr/bin/env python3
"""Bench regression gate: compare a graft.Bench JSON line against the
committed BENCH_BASELINE.json and fail (exit 1) on >1.5x per-query
regression.

Usage:
    sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' > /tmp/bench.json
    python3 tools/check_bench.py /tmp/bench.json [BENCH_BASELINE.json]

The baseline records the cpu count and sf dir it was measured at;
comparisons against a different configuration are refused rather than
producing a meaningless verdict. Methodology is pinned to collect()
materialization (see Bench.scala) — never compare across methodology
changes.
"""
import json
import re
import sys

THRESHOLD = 1.5


def main() -> int:
    bench_path = sys.argv[1]
    base_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_BASELINE.json"
    with open(base_path) as f:
        base = json.load(f)
    # the bench line may be embedded in sbt log output
    raw = open(bench_path).read()
    m = re.search(r'\{"metric".*\}', raw)
    if not m:
        print(f"check_bench: no bench JSON line found in {bench_path}")
        return 2
    bench = json.loads(m.group(0))
    if bench.get("sf") != base.get("sf"):
        print(f"check_bench: sf mismatch ({bench.get('sf')} vs baseline "
              f"{base.get('sf')}) — refusing to compare")
        return 2
    regressions = []
    for name, sec in bench["queries"].items():
        b = base["queries"].get(name)
        if b is None:
            continue  # new query this round; no baseline yet
        if sec > THRESHOLD * b:
            regressions.append((name, sec, b, sec / b))
    for name, sec, b, ratio in sorted(regressions, key=lambda r: -r[3]):
        print(f"REGRESSION {name}: {sec:.3f}s vs baseline {b:.3f}s "
              f"({ratio:.2f}x > {THRESHOLD}x)")
    ok = len(bench["queries"]) - len(regressions)
    print(f"{ok} within bound, {len(regressions)} regressed "
          f"(baseline round {base.get('round')}, cpus {base.get('cpus')})")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
