#!/usr/bin/env python3
"""Bench regression gate, drift-normalized: compare a graft.Bench JSON
line against the committed BENCH_BASELINE.json and fail (exit 1) on
per-query or total regressions AFTER dividing out environment drift.

Usage:
    sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' > /tmp/bench.json
    python3 tools/check_bench.py /tmp/bench.json [BENCH_BASELINE.json]

Cross-session absolute seconds are not comparable (round 3 measured a
uniform 20-40% drift on byte-identical code), so both the baseline and
the candidate record `calib`: the seconds of a FROZEN synthetic
workload (Bench.calibrate) timed in the same session as the queries.
Since round 5 the bench also records `calib_post`, the same workload
re-timed AFTER the timed loop, and the effective calibration is the
geometric mean of the two (the timed loop sits between them, so their
ratio-space midpoint estimates the environment the queries saw).

Since round 7 there are TWO drift axes: `calib` (compute: a 40M-row
shuffle+agg) and `calib_ovh` (fixed per-query floor: fresh-plan tiny
jobs timing Catalyst planning + scheduling + collect). The round-7
bisect of the round-6 `dash_filtered_kpis:1.71x` flag measured the
compute calib swinging 1.4x across consecutive idle JVMs while the
smallest query's wall time held still at ~0.2s: one compute-only
drift over-penalizes overhead-dominated queries exactly when the
compute calib dips. A query is therefore flagged only when it is slow
under the MORE FAVORABLE axis: sec > 1.5 * baseline *
max(drift_compute, drift_overhead), and the total (queries present in
both files, symmetrically) when total > 1.3 * baseline_total *
max-drift. A baseline without `calib_ovh` degrades to compute-only
drift. INJECT_SLOW (true 2x execution regression) moves queries and
neither calibration, so it trips under max-drift.

Unstable environment: when pre/post calibrations disagree by more than
CALIB_AGREEMENT (1.3x, mirrored in Bench.CalibAgreement), the
environment shifted DURING the timed loop and no per-query verdict is
trustworthy — this script exits 2 ("no verdict"). Exit 2 is NOT a
pass: it is a MANDATORY re-run signal. Callers must re-run graft.Bench
(on a quiet machine) and re-check; treating exit 2 as success would
silently defer a real regression forever. Bench itself already retries
the whole timed loop up to Bench.MaxAttempts times looking for a
stable window before emitting an unstable line, so exit 2 here means
the machine was loaded for the entire bench run.

The baseline records the sf dir, cpu count, and calib it was measured
at; comparisons against a different configuration (or a baseline
without calib) are refused (exit 2) rather than producing a
meaningless verdict. Methodology is pinned to collect()
materialization with two interleaved timed passes and pre/post
calibration on both axes (see Bench.scala) — never compare across
methodology changes without re-recording the baseline (round 6
shipped a reproducible false flag by comparing interleaved-pass times
against a back-to-back-recorded baseline).

Since round 13 Bench also RETRIES (within its MaxAttempts budget) any
stable attempt whose own soft-regression report carries per-query
flags, recording the attempt with the fewest flags: round 12 shipped
a red artifact from session contention that the calibrations
straddled (all 13 queries uniformly ~1.5x, calib axes 0.91x/1.22x in
opposite directions, same-code idle re-run faster than baseline). A
deterministic regression flags every attempt, so this filter only
removes non-reproducible contention; the line also records `load1`
(1-min load average at bench start) for post-hoc attribution.

Gate self-test: run Bench with SPARK_GRAFT_INJECT_SLOW=1 (every timed
query executes twice — a deterministic 2x execution-cost regression)
— this script must exit 1. Plan-level degradations (codegen off, no
cache, broadcast->SMJ) were measured to move sf0.1 per-query times by
<10%: wall time at this scale is fixed per-query overhead, so only a
magnitude-pinned injection tests the gate deterministically.
"""
import json
import re
import sys

THRESHOLD = 1.5
TOTAL_THRESHOLD = 1.3
# Memo-tier hard bound (overhead-axis-normalized; see the serving
# section below for the four-round variance calibration).
MEMO_THRESHOLD = 1.5
# Max/min ratio the pre- and post-loop calibrations may disagree by
# before the run is declared unstable (exit 2, no verdict). Mirrored in
# Bench.CalibAgreement.
CALIB_AGREEMENT = 1.3


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__.strip().split("\n\n")[1])  # the Usage block
        return 2
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
    for key in ("sf", "cpus"):
        if bench.get(key) != base.get(key):
            print(f"check_bench: {key} mismatch ({bench.get(key)} vs "
                  f"baseline {base.get(key)}) — refusing to compare")
            return 2
    if not base.get("calib") or not bench.get("calib"):
        print("check_bench: calib missing (baseline and candidate must both "
              "record the frozen calibration workload) — refusing to compare")
        return 2
    calib = bench["calib"]
    calib_post = bench.get("calib_post")
    calib_ovh = bench.get("calib_ovh")
    calib_ovh_post = bench.get("calib_ovh_post")
    # `is not None`, not truthiness: a (degenerate) 0.0 must hit the
    # validation below, not silently fall back to the pre-round-5 path.
    for label, val in [("calib", calib), ("calib_post", calib_post),
                       ("calib_ovh", calib_ovh),
                       ("calib_ovh_post", calib_ovh_post),
                       ("baseline calib", base.get("calib")),
                       ("baseline calib_ovh", base.get("calib_ovh"))]:
        if val is not None and val <= 0:
            print(f"check_bench: degenerate {label} ({val}) — refusing "
                  "to compare")
            return 2

    def effective_or_none(pre, post, label):
        """Geometric mean of pre/post (the timed loop sits between the
        calibrations, so their ratio-space midpoint estimates what the
        queries saw); None return = unstable (no verdict)."""
        if post is None:
            return pre  # pre-round-5 bench line; pre-loop calib only
        agreement = max(pre, post) / min(pre, post)
        if agreement > CALIB_AGREEMENT:
            print(f"check_bench: unstable environment — pre/post {label} "
                  f"{pre:.3f}s / {post:.3f}s disagree "
                  f"{agreement:.2f}x > {CALIB_AGREEMENT}x — no verdict. "
                  f"Exit 2 is a MANDATORY re-run signal, not a pass: "
                  f"re-run graft.Bench on a quiet machine "
                  f"(bench already retried {bench.get('attempts', 1)} "
                  f"attempt(s) internally).")
            return None
        return (pre * post) ** 0.5

    # Pre/post disagreement on either axis means the environment
    # shifted DURING the timed loop — a contention burst
    # min-of-two-passes can't reject. No verdict beats false flags
    # (round 4 shipped three of them).
    effective = effective_or_none(calib, calib_post, "calib")
    if effective is None:
        return 2
    drift_c = effective / base["calib"]
    drift = drift_c
    axis = f"compute {drift_c:.2f}x"
    if calib_ovh is not None and base.get("calib_ovh"):
        effective_ovh = effective_or_none(calib_ovh, calib_ovh_post,
                                          "calib_ovh")
        if effective_ovh is None:
            return 2
        drift_o = effective_ovh / base["calib_ovh"]
        # per-query bound uses the MORE FAVORABLE axis (see docstring):
        # flag only what is slow under both normalizations.
        drift = max(drift_c, drift_o)
        axis = f"compute {drift_c:.2f}x, overhead {drift_o:.2f}x"
    # FLOOR at 1.0 (round 14): an environment FASTER than baseline
    # must not manufacture regressions. Four same-code runs in one
    # session measured totals 5.63-7.00s while the calibrations swung
    # 0.271-0.385s (drift 0.60-1.16x) — the sf0.1 headline queries are
    # floor-bound (scheduling + planning + cached-scan costs that do
    # not scale down with an idle machine the way the synthetic
    # calibrations do), so at drift < 1 the gate outcome tracked
    # calibration luck, not code. This is the round-6 "compute calib
    # dips" failure hitting BOTH axes at once; the clamp completes the
    # round-7 two-axis fix. Detection power is preserved where it was
    # ever reliable: on a same-or-slower environment (drift >= 1) the
    # thresholds are unchanged, and INJECT_SLOW moves queries without
    # moving either calibration, so it trips at any drift (self-test
    # re-run green after this change).
    gate_drift = max(drift, 1.0)
    clamp_note = (f", clamped to {gate_drift:.2f}x for the gate"
                  if gate_drift != drift else "")
    print(f"environment drift: {drift:.2f}x (max of {axis}; "
          f"calib {effective:.3f}s vs baseline {base['calib']:.3f}s"
          f"{clamp_note})")
    drift = gate_drift
    regressions = []
    for name, sec in bench["queries"].items():
        b = base["queries"].get(name)
        if b is None:
            continue  # new query this round; no baseline yet
        if sec > THRESHOLD * b * drift:
            regressions.append((name, sec, b * drift, sec / (b * drift)))
    for name, sec, b, ratio in sorted(regressions, key=lambda r: -r[3]):
        print(f"REGRESSION {name}: {sec:.3f}s vs drift-adjusted baseline "
              f"{b:.3f}s ({ratio:.2f}x > {THRESHOLD}x)")
    # symmetric total: only queries present in BOTH files count, on
    # both sides — otherwise a query added to the headline after the
    # baseline was recorded silently eats the total's 1.3x headroom
    # (round-6 ADVICE).
    shared = [n for n in bench["queries"] if n in base["queries"]]
    base_total = sum(base["queries"][n] for n in shared)
    total = sum(bench["queries"][n] for n in shared)
    total_reg = total > TOTAL_THRESHOLD * base_total * drift
    if total_reg:
        print(f"REGRESSION total: {total:.3f}s vs drift-adjusted baseline "
              f"{base_total * drift:.3f}s (> {TOTAL_THRESHOLD}x)")
    # Serving tier (round-9 verdict follow-up). Two checks:
    #  - serving.errs (recorded per-query failures — Bench no longer
    #    swallows serving-tier exceptions) is a HARD failure: a broken
    #    QueryMemo path must fail the bench visibly, not present as a
    #    near-zero "win";
    #  - memo-tier TOTAL is a HARD gate since round 12 (promoted from
    #    the round-9 soft warning after four rounds of variance data:
    #    memo_total/calib_ovh sat in [0.65, 0.86] across r9-r12
    #    sessions — a 1.3x residual spread — while a broken memo path
    #    re-executing fresh plans lands at 15-25x). Memo latency is
    #    pure per-query overhead (planning floor + collect of cached
    #    rows), so it normalizes by the OVERHEAD drift axis alone
    #    against the calibration snapshot of the session that recorded
    #    the memo baseline (`memo_calib_ovh` — the fresh-tier queries
    #    keep their round-7 record; mixing axes here would loosen the
    #    gate whenever compute drifts high). Per-query memo times stay
    #    ungated: 15 ms quantities are ratio-noise.
    serving_errs = (bench.get("serving") or {}).get("errs") or {}
    for k, msg in serving_errs.items():
        print(f"SERVING ERROR {k}: {msg}")
    memo_reg = False
    memo = (bench.get("serving") or {}).get("memo") or {}
    base_memo = (base.get("serving") or {}).get("memo") or {}
    memo_shared = [n for n in memo if n in base_memo]
    if memo_shared:
        memo_total = sum(memo[n] for n in memo_shared)
        base_memo_total = sum(base_memo[n] for n in memo_shared)
        memo_base_ovh = base.get("memo_calib_ovh")
        if memo_base_ovh and calib_ovh is not None:
            eff_ovh = effective_or_none(calib_ovh, calib_ovh_post,
                                        "calib_ovh")
            if eff_ovh is None:
                return 2
            memo_drift = eff_ovh / memo_base_ovh
            memo_bound = MEMO_THRESHOLD * base_memo_total * memo_drift
            if memo_total > memo_bound:
                memo_reg = True
                print(f"REGRESSION memo-tier total {memo_total:.3f}s vs "
                      f"overhead-drift-adjusted baseline "
                      f"{base_memo_total * memo_drift:.3f}s "
                      f"(> {MEMO_THRESHOLD}x, ovh drift "
                      f"{memo_drift:.2f}x)")
            else:
                print(f"memo-tier total {memo_total:.3f}s within "
                      f"{MEMO_THRESHOLD}x of {base_memo_total:.3f}s "
                      f"(ovh drift {memo_drift:.2f}x)")
        else:
            # baseline predates the memo record: soft warning only
            ratio = memo_total / (base_memo_total * drift)
            if ratio > TOTAL_THRESHOLD:
                print(f"WARNING memo-tier total {memo_total:.3f}s vs "
                      f"drift-adjusted baseline "
                      f"{base_memo_total * drift:.3f}s "
                      f"({ratio:.2f}x > {TOTAL_THRESHOLD}x) — soft check, "
                      f"investigate QueryMemo but not a gate failure")
    ok = len(bench["queries"]) - len(regressions)
    print(f"{ok} within bound, {len(regressions)} regressed, total "
          f"{'REGRESSED' if total_reg else 'ok'} (baseline round "
          f"{base.get('round')}, cpus {base.get('cpus')})")
    return 1 if (regressions or total_reg or serving_errs
                 or memo_reg) else 0


if __name__ == "__main__":
    sys.exit(main())
