"""HyperLogLog cardinality sketch: per-source unique-content estimate.

The bounded-state CARDINALITY twin of operators/countmin.py (frequency):
count-min answers "how often", HyperLogLog answers "how many distinct"
— together they are the two sketches every crawl accounting pipeline
ships (Flajolet et al. 2007; Heule et al. 2013 "HyperLogLog in
practice" is the production variant whose small-range correction this
uses). The reference has no sketch operators at all (its dedup story is
exact, in-memory, single-node — SURVEY §2.6); at 10^12 documents the
first question a crawl operator asks — "how many UNIQUE pages does each
source contribute?" — cannot afford the exact answer's digest shuffle
every time, so the estimator runs next to the exact job and replaces it
on the hot path.

Cross-engine determinism (the countmin/pagerank discipline): every
register update is exact integer arithmetic from md5 hex substrings —
register index = first 2 hex chars mod m, rank rho = leading-zero count
of the next 60 bits + 1, computed as 61 - bitlength via ``bin()``
string length (both engines' ``bin`` renders minimal binary; floor(log2)
is NOT used because doubles round 2^k - 1 up at k >= 50). The harmonic
denominator sum(2^-M_j) is carried as the exact integer
sum(2^(61 - M_j)) — shiftleft into DECIMAL on Spark, ``<<`` into
HUGEINT on DuckDB (DuckDB's ``^`` returns DOUBLE and is avoided) — so
both engines divide identical integers and the only floats are one
final division plus the standard m*ln(m/V) small-range branch, rounded
to 4 decimals on both sides (house float rule).

Scale shape (10^12 rows): the sketch is ONE map-side partial-max
aggregation — the Exchange after partial combine carries at most
sources x m = a few thousand (source, register, max-rho) rows per
partition regardless of input size, and registers merge by max, which
is exactly what a re-aggregation over more executors does (HLL's merge
operator IS the groupBy). The exact countDistinct twin computed
alongside shuffles every distinct digest and exists here as the
verification contrast — at scale it is the job you no longer run.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ragflow_spark.operators.registry import register, spread, table

HLL_M = 64  # registers (p = 6 index bits)
# alpha_64 from Flajolet et al. 2007 Fig. 3 (m = 64 -> 0.709); the
# raw-estimate numerator alpha * m^2 * 2^61 is precomputed driver-side
# as one Python double and embedded verbatim in BOTH engines so neither
# re-associates the float product (repr round-trips to the same IEEE
# double under Python, Spark and DuckDB literal parsing).
HLL_ALPHA = 0.709
_POW2_61 = 1 << 61
_RAW_NUMER = HLL_ALPHA * (HLL_M * HLL_M) * float(_POW2_61)
# Heule et al. small-range threshold: use linear counting below 2.5*m
_SMALL_RANGE = 2.5 * HLL_M

_HLL_ORACLE = f"""
    WITH hashed AS (
      SELECT source,
             ('0x' || substr(md5(text), 1, 2))::INT % {HLL_M} AS idx,
             ('0x' || substr(md5(text), 3, 15))::BIGINT AS w60
      FROM documents
    ), regs AS (
      SELECT source, idx,
             max(CASE WHEN w60 = 0 THEN 61
                      ELSE 61 - length(bin(w60)) END) AS m
      FROM hashed GROUP BY source, idx
    ), folded AS (
      SELECT source,
             sum(1::HUGEINT << (61 - m)) AS present_sum,
             count(*) AS n_present,
             max(m) AS max_rho
      FROM regs GROUP BY source
    ), exact AS (
      SELECT source, count(DISTINCT md5(text))::BIGINT AS n_exact
      FROM documents GROUP BY source
    ), est AS (
      SELECT f.source, e.n_exact, f.max_rho::BIGINT AS max_rho,
             ({HLL_M} - f.n_present)::BIGINT AS v_empty,
             {_RAW_NUMER!r} /
               (f.present_sum
                + ({HLL_M} - f.n_present)::HUGEINT * (1::HUGEINT << 61)
               )::DOUBLE AS e_raw
      FROM folded f JOIN exact e USING (source)
    )
    SELECT source, n_exact, v_empty, max_rho,
           round(CASE WHEN e_raw <= {_SMALL_RANGE!r} AND v_empty > 0
                      THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / v_empty)
                      ELSE e_raw END, 4) AS hll_estimate,
           round(abs(CASE WHEN e_raw <= {_SMALL_RANGE!r} AND v_empty > 0
                          THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / v_empty)
                          ELSE e_raw END - n_exact) / n_exact, 4) AS rel_err
    FROM est
    """


def hll_register_table(docs):
    """(source, idx, m) register table over a documents-shaped frame —
    the shared sketch kernel: the batch query aggregates it straight
    to estimates, and the streaming companion
    (streaming/hll_stream.py) folds per-micro-batch register tables
    into a running sketch by elementwise max, which is exact because
    max-merge IS the HLL union operator."""
    h = F.md5(F.col("text"))
    hashed = docs.select(
        "source",
        (F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % HLL_M).alias(
            "idx"
        ),
        F.conv(F.substring(h, 3, 15), 16, 10).cast("long").alias("w60"),
    )
    rho = F.when(F.col("w60") == 0, F.lit(61)).otherwise(
        F.lit(61) - F.length(F.bin(F.col("w60")))
    )
    return (
        hashed.select("source", "idx", rho.alias("m"))
        .groupBy("source", "idx")
        .agg(F.max("m").alias("m"))
    )


def estimate_registers(m_values) -> tuple[int, float]:
    """(v_empty, estimate) from a full m-length register vector —
    the pure-Python twin of the in-plan estimator, shared by the
    streaming fold and the differential tests (same raw formula,
    same Heule small-range branch, unrounded)."""
    import math

    assert len(m_values) == HLL_M
    denom = sum(1 << (61 - int(m)) for m in m_values)
    e_raw = _RAW_NUMER / float(denom)
    v = sum(1 for m in m_values if m == 0)
    if e_raw <= _SMALL_RANGE and v > 0:
        return v, HLL_M * math.log(HLL_M / v)
    return v, e_raw


@register("hll_cardinality", oracle=_HLL_ORACLE)
def hll_cardinality(spark, sf_dir):
    """Per-source unique-content cardinality, estimated with a
    {HLL_M}-register HyperLogLog over md5(text) and verified against
    the exact countDistinct twin: emits the exact count, the sketch
    estimate (with Heule small-range linear counting when the raw
    estimate falls under 2.5m and empty registers remain) and the
    relative error. Module docstring has the exact-integer register
    arithmetic both engines share.

    Plan: one partial-max aggregation whose Exchange carries at most
    sources x {HLL_M} register rows per partition (the sketch), one
    distinct-digest shuffle (the exact twin this operator exists to
    replace at scale), one tiny join of two per-source aggregates."""
    docs = spread(table(spark, sf_dir, "documents").select("source", "text"))
    h = F.md5(F.col("text"))
    regs = hll_register_table(docs)
    folded = regs.groupBy("source").agg(
        F.sum(
            F.expr("CAST(shiftleft(CAST(1 AS BIGINT), 61 - m) AS DECIMAL(20,0))")
        ).alias("present_sum"),
        F.count(F.lit(1)).alias("n_present"),
        F.max("m").cast("long").alias("max_rho"),
    )
    exact = docs.groupBy("source").agg(
        F.countDistinct(h).alias("n_exact")
    )
    denom = (
        F.col("present_sum")
        + (F.lit(HLL_M) - F.col("n_present")).cast("decimal(20,0)")
        * F.lit(_POW2_61).cast("decimal(20,0)")
    ).cast("double")
    est = folded.join(exact, "source").select(
        "source",
        "n_exact",
        (F.lit(HLL_M) - F.col("n_present")).cast("long").alias("v_empty"),
        "max_rho",
        (F.lit(_RAW_NUMER) / denom).alias("e_raw"),
    )
    corrected = F.when(
        (F.col("e_raw") <= F.lit(_SMALL_RANGE)) & (F.col("v_empty") > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("v_empty")),
    ).otherwise(F.col("e_raw"))
    return est.select(
        "source",
        "n_exact",
        "v_empty",
        "max_rho",
        F.round(corrected, 4).alias("hll_estimate"),
        F.round(F.abs(corrected - F.col("n_exact")) / F.col("n_exact"), 4).alias(
            "rel_err"
        ),
    )
