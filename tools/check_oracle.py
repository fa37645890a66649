#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Builder-side self-check ONLY (the Scala library never depends on this).
Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify, runs the oracle SQL in DuckDB
over the same parquet tables and compares: column-name set, row count,
and a hash of the (column-name-sorted, row-sorted) values.
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.map(lambda v: str(v)))
    return df


def cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        return repr(v)  # full precision — exact match required
    return str(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # graft.Verify records per-query failures as a manifest (the dump
    # dir is simply missing otherwise, which reads as "unregistered"):
    # surface the actual exceptions next to the FAIL rows they cause.
    try:
        for name, msg in json.load(
                open(f"{out_dir}/verify_errors.json")).items():
            print(f"VERIFY-ERROR {name}: {msg}")
    except FileNotFoundError:
        pass  # pre-round-11 dump
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
            exp = canon(con.execute(sql).df())
            if list(got.columns) != list(exp.columns):
                print(f"FAIL {name}: columns spark={list(got.columns)} duck={list(exp.columns)}")
                n_bad += 1
                continue
            if len(got) != len(exp):
                print(f"FAIL {name}: rows spark={len(got)} duck={len(exp)}")
                n_bad += 1
                continue
            diffs = []
            for c in got.columns:
                a = [cell(v) for v in got[c]]
                b = [cell(v) for v in exp[c]]
                if a != b:
                    bad = next(i for i in range(len(a)) if a[i] != b[i])
                    diffs.append(f"{c}[{bad}]: spark={a[bad]} duck={b[bad]}")
            if diffs:
                print(f"FAIL {name}: " + "; ".join(diffs[:3]))
                n_bad += 1
            else:
                print(f"ok   {name} ({len(got)} rows)")
                n_ok += 1
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failing")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
