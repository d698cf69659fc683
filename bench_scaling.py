#!/usr/bin/env python3
"""Two-parallelism scaling bench (north rule evidence).

The rule's "N vs 4N executors, scaling efficiency >= 0.8" criterion
cannot use a real cluster in this sandbox, so we run the SAME
extraction job on the SAME cached input at local[8] and local[32]
(fresh JVM per level via subprocess) and report throughput at both
plus efficiency = (T_8 / T_32) / 4.

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

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEAT = os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "96")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
LEVELS = (8, 32)


def run_level(cores: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=SF_DIR,
        SPARK_GRAFT_CPUS=str(cores),
        SPARK_GRAFT_BENCH_REPEAT=REPEAT,
        SPARK_GRAFT_BENCH_SKIP_QUERIES="1",
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
    results: dict[int, list[dict]] = {}
    for cores in LEVELS:
        results[cores] = [run_level(cores) for _ in range(RUNS)]
        walls = [r["queries"]["extract"] for r in results[cores]]
        print(
            f"# local[{cores}]: walls={[round(w, 2) for w in walls]}",
            file=sys.stderr,
        )

    med = {c: statistics.median(r["queries"]["extract"] for r in results[c]) for c in LEVELS}
    rep = {c: results[c][0] for c in LEVELS}
    n, four_n = LEVELS
    eff = (med[n] / med[four_n]) / (four_n / n)

    docs = rep[four_n]["extract_docs"]
    mb = rep[four_n]["extract_mb_in"]
    summary = {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "queries": {
            f"extract_local{c}": round(med[c], 3) for c in LEVELS
        },
        "sf": rep[four_n]["sf"],
        "docs": docs,
        "mb_in": mb,
        "docs_per_sec": {c: round(docs / med[c], 1) for c in LEVELS},
        "mb_per_sec": {c: round(mb / med[c], 2) for c in LEVELS},
        "runs_per_level": RUNS,
        "pass_ge_0.8": eff >= 0.8,
    }

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE.md — measured numbers

Input: deterministic synthetic pages from `{SF_DIR}/documents.parquet`
tiled x{REPEAT} -> {docs:,} pages ({mb:.1f} MB of html payload), cached
as parquet (`bench.py::pages_parquet`). Same input, same seed, fresh
JVM per parallelism level; median of {RUNS} runs; the timed job is
parquet scan -> split assignment (url-host hash + size-proportional
salting) -> zero-shuffle vectorized mapInPandas extraction ->
count/bytes aggregate.

## Two-cluster-size scaling (sandbox proxy for N vs 4N executors)

| parallelism | extract wall (median, s) | docs/sec | MB/sec |
|---|---|---|---|
| local[8]  (N)  | {med[8]:.2f} | {docs / med[8]:,.0f} | {mb / med[8]:.2f} |
| local[32] (4N) | {med[32]:.2f} | {docs / med[32]:,.0f} | {mb / med[32]:.2f} |

**Scaling efficiency = (T_8 / T_32) / 4 = {eff:.3f}** (target >= 0.8:
{"PASS" if eff >= 0.8 else "FAIL"}).

The extraction stage is ZERO-SHUFFLE (the html payload maps straight
from the scan into the pandas kernel; only small extracted rows ever
shuffle), so wall-clock scales with cores; the residual below 1.0 is
fixed job overhead (scan planning + the final 2-row aggregate).

Raw per-run walls (s): local[8] {[round(r["queries"]["extract"], 2) for r in results[8]]},
local[32] {[round(r["queries"]["extract"], 2) for r in results[32]]}.
"""
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
