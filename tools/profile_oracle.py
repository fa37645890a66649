#!/usr/bin/env python3
"""Per-entry DuckDB cost profile of the oracle suite.

Builder-side self-check ONLY (the Scala library never depends on this).
Usage: python3 tools/profile_oracle.py <sfDir> <oracle_sql.json> [outJson]

Round 14's CORRECTNESS artifact came back `{}` because the oracle
suite's DuckDB cost had grown past the driver's budget (~16 min wall;
two ~39 s entries ran byte-identical SQL). This profile times every
entry so growth is visible in review BEFORE it zeroes a round's
signal. Budget: full-suite wall under ~5 minutes, no entry over ~10 s.
The result is committed as ORACLE_PROFILE.json.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else "ORACLE_PROFILE.json"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(oracle_path))
    times = {}
    t_all = time.time()
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            n = len(con.execute(sql).fetchall())
            dt = time.time() - t0
            times[name] = round(dt, 3)
            flag = "  <-- OVER 10s BUDGET" if dt > 10 else ""
            print(f"{dt:8.2f}s  {name} ({n} rows){flag}")
        except Exception as e:
            times[name] = -1.0
            print(f"   ERROR  {name}: {type(e).__name__}: {e}")
    wall = time.time() - t_all
    over = [k for k, v in times.items() if v > 10]
    print(f"\ntotal {wall:.1f}s wall for {len(oracle)} entries; "
          f"{len(over)} over the 10s per-entry budget: {over}")
    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf_dir, "wall_sec": round(wall, 1),
                   "entries": dict(sorted(times.items(),
                                          key=lambda kv: -kv[1])),
                   "over_budget": over}, f, indent=1)
    print(f"profile -> {out_path}")
    sys.exit(1 if over else 0)


if __name__ == "__main__":
    main()
