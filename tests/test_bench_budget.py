"""Per-query bench regression guard (VERDICT r3 task 7 / r4 task 3).

Round 4 shipped a bench-aborting regression with zero test signal; this
guard makes any >1.5x per-query slowdown (vs the round-3 driver bench,
reconstructed in ``bench_baseline_r03.json``) a red test BEFORE the
driver's own bench run sees it.

Runs ``bench.py`` as a subprocess so the timing config matches the
driver exactly (own JVM, local[$SPARK_GRAFT_CPUS] = 32, sf0.1) instead
of piggybacking on the 8-cpu test session. Marked ``slow``: one full
bench (~1.5 min) per pytest run.

Baseline provenance: ``bench_baseline.json`` is the per-query MAX over
two round-6 bench runs on this box (suite totals 78.9 s / 82.7 s,
load1 ~2), captured AFTER the round-6 perf fixes (ngram_hashes and the
PPJoin pack reverted to JVM md5 — q49 11.6->6.6, q27 6.4->5.1,
q63 1.67->1.46 vs the round-5 MAX-of-5 baseline) and under the
documented real-table warmup methodology (see bench.py); q73's entry
is likewise the MAX over its first two round-6 bench runs (q74-q77 same
convention; q78-q84, declared later in round 6, use their first full-suite
bench run — captured under load1 ~1.7, so already noise-inflated). The host has
a noisy co-tenant (load-average 1.5-2.7 with zero of our processes
running) that swings whole-suite totals 75-85 s run to run and single
queries up to ~1.5x between consecutive runs — the 1.5x ratio plus
0.75 s floor absorbs that. ``bench_baseline_r03.json`` is kept for
reference. Per VERDICT r5 task 4, once a driver-parsed BENCH_r06
exists (the round-6 bench tail fix makes that possible), re-anchor to
the driver's numbers x this same stated factor. Guarding against a
same-box ceiling is what catches real code regressions; guarding
against another machine's numbers would only measure the machine.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(REPO, "tests", "bench_baseline.json")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Wall-clock tolerance: 1.5x the r03 time, but never tighter than
# +0.75 s — sub-second queries jitter more than 50% on a shared box,
# and the guard is for real regressions, not scheduler noise.
RATIO, FLOOR_S = 1.5, 0.75


def _run_bench() -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"bench.py rc={proc.returncode}: {proc.stderr[-2000:]}"
    lines = proc.stdout.strip().splitlines()
    # bench.py prints the FULL record (long query names) then a compact
    # driver-tail line (short qNN keys) — see bench.py docstring. The
    # guard budgets per full name, so parse the full record.
    out = json.loads(lines[-2])
    assert out["metric"] == "declared_query_suite_runtime_full"

    # driver-tail contract (round-6 fix for BENCH_r03/r05 parsed:null):
    # the final line must parse standalone and fit the ~2000-char tail
    tail_line = lines[-1]
    assert len(tail_line) < 1800, f"driver-tail line too long: {len(tail_line)}"
    tail = json.loads(tail_line)
    assert tail["metric"] == "declared_query_suite_runtime"
    assert tail["value"] == out["value"]
    assert len(tail["queries"]) == len(out["queries"])

    # failure isolation contract: every declared query must have timed
    assert not out.get("errors"), f"bench reported per-query errors: {out['errors']}"
    return out


def _overruns(times: dict, base: dict) -> dict:
    return {
        name: (t, base[name])
        for name, t in times.items()
        if name in base and t > max(RATIO * base[name], base[name] + FLOOR_S)
    }


@pytest.mark.slow
def test_per_query_bench_budget():
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} missing")
    # A loaded box (e.g. the rest of the suite just pinned 8 cores, or
    # the host's noisy co-tenant is active) inflates wall-clock 2-5x and
    # would red the guard with zero code signal. Wall-clock budgets are
    # only meaningful quiet; skip loudly otherwise.
    load1 = os.getloadavg()[0]
    if load1 > 4.0:
        pytest.skip(f"box too loaded for wall-clock budgets (load1={load1:.1f})")
    with open(BASELINE) as f:
        base = json.load(f)

    out = _run_bench()
    missing = sorted(set(base) - set(out["queries"]))
    assert not missing, f"queries missing from bench output: {missing}"
    times = dict(out["queries"])

    # The co-tenant's load spikes (measured round 6: two back-to-back
    # runs flagged DISJOINT query sets — q42/q08 in one, the q63-q66
    # block in the other) would red the guard with zero code signal. A
    # real regression is present in EVERY run, noise isn't: on overrun,
    # rerun once and budget against the per-query MIN of the two runs.
    if _overruns(times, base):
        out2 = _run_bench()
        times = {
            n: min(t, out2["queries"].get(n, t)) for n, t in times.items()
        }

    over = _overruns(times, base)
    assert not over, (
        "per-query bench regression >1.5x vs baseline in two consecutive "
        f"runs (query: (min_now_s, base_s)): {over}"
    )
    total_base = sum(base.values())
    total = sum(times.values())
    assert total <= RATIO * total_base, (
        f"suite total regressed: {total:.1f}s vs baseline {total_base:.1f}s"
    )
