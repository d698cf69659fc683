"""Query registry: name -> (spark, sf_dir) -> DataFrame, + oracle SQL.

Contract (driver `__spark_entry__.py`): every computed column is
aliased identically in the Spark plan and the oracle SQL; doubles are
rounded to 4 decimals on BOTH sides (Spark and DuckDB may differ in
the last ulp of a float aggregate); timestamps are rendered as
'yyyy-MM-dd HH:mm:ss' strings on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

QUERIES: dict[str, Callable] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def table(spark, sf_dir: str, name: str):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def spread(df):
    """Repartition ONLY when the scan underprovisions the cluster
    (tiny test files -> 1-4 partitions on 32 cores, which serializes
    compute-heavy per-row operators). At crawl scale the scan has
    ample splits and this is a no-op; inputFiles() is a listing, not
    an RDD conversion."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if len(df.inputFiles()) < max(2, target // 2):
        return df.repartition(target)
    return df
