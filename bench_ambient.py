"""Ambient-host certification for bench runs (VERDICT r4 item 1).

This VM suffers multi-hour hypervisor steal storms (BENCH/BASELINE.md
ambient-conditions log: extract measured 32-52 s against a 4.955 s
idle min with 13%+ steal). A bench JSON without ambient evidence
cannot distinguish a steal storm from a 4x code regression, so every
bench run brackets itself with two independent probes:

1. /proc/stat steal ticks (field 9 of the aggregate cpu line): the
   hypervisor's own report of cycles stolen from this VM. >2% of
   capacity over the run interval = contaminated (measured threshold,
   see CLAUDE.md "Bench noise").
2. A short N-way spin calibration: N pure-python spin processes
   should take the same wall time as one on an idle N+ core box;
   efficiency = t1/tN well below 1.0 means co-tenant pressure the
   steal counter may under-report (observed round 4: a "clean" 2.8%
   steal bracket still ran extract 2.5x its idle min).

The bench emits both probes plus a `bracket_clean` bool in its JSON
line; regression attribution is suppressed (moved to
`regressions_unattributable`) when the bracket is dirty.
"""

from __future__ import annotations

import time

# measured thresholds (CLAUDE.md "Bench noise", memory notes round 4)
STEAL_PCT_DIRTY = 2.0
CALIB_EFF_DIRTY = 0.75
_SPIN_N = 6_000_000  # ~0.3-0.5 s single-process on this box


def read_cpu_ticks() -> tuple[int, int]:
    """(steal_ticks, total_ticks) from the aggregate cpu line.

    /proc/stat layout: cpu user nice system idle iowait irq softirq
    steal guest guest_nice -- steal is the 8th value after the label.
    """
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(v) for v in parts[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def steal_pct(before: tuple[int, int], after: tuple[int, int]) -> float:
    """Percent of VM capacity stolen by the hypervisor over the
    interval between two read_cpu_ticks() samples."""
    d_steal = after[0] - before[0]
    d_total = after[1] - before[1]
    return round(100.0 * d_steal / d_total, 2) if d_total > 0 else 0.0


def _spin(n: int) -> int:
    x = 0
    for i in range(n):
        x += i & 7
    return x


def _timed_spin(n: int) -> float:
    t0 = time.perf_counter()
    _spin(n)
    return time.perf_counter() - t0


def spin_calibration(cores: int, n: int = _SPIN_N) -> dict:
    """Spin wall time of 1 process vs `cores` concurrent ones, each
    child timing its own spin — fork/join overhead is excluded, so the
    ratio isolates CPU contention. `efficiency` compares against the
    MEDIAN child (how a many-task Spark stage experiences the box:
    work spreads across slots, a single descheduled straggler is
    amortized); `efficiency_worst` against the slowest child is
    reported alongside (measured on this VM the two differ ~1.5x under
    partial oversubscription — a subset of vCPUs contended). On an
    idle box both are ~1.0. Pure fork+spin: no Spark, no imports, ~1 s.
    """
    import multiprocessing as mp
    import statistics

    t1 = _timed_spin(n)
    ctx = mp.get_context("fork")
    with ctx.Pool(cores) as pool:
        durs = pool.map(_timed_spin, [n] * cores)
    med = statistics.median(durs)
    worst = max(durs)
    return {
        "t1_s": round(t1, 3),
        "tN_s": round(med, 3),
        "worst_s": round(worst, 3),
        "n_procs": cores,
        "efficiency": round(t1 / med, 3) if med > 0 else 0.0,
        "efficiency_worst": round(t1 / worst, 3) if worst > 0 else 0.0,
    }


def bracket_verdict(run_steal_pct: float, calib_efficiency: float) -> bool:
    """True when neither probe shows contamination."""
    return (
        run_steal_pct <= STEAL_PCT_DIRTY
        and calib_efficiency >= CALIB_EFF_DIRTY
    )
