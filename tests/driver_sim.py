#!/usr/bin/env python3
"""Standalone simulation of the correctness driver (not a pytest —
it builds its own vanilla SparkSession like the harness does).

Runs entry() plus EVERY queries() entry against its oracle_sql() via
DuckDB at sf0.01, under a deliberately non-UTC process TZ, comparing
row multisets with 4-decimal float canonicalization (the harness
contract) AND raw-value equality (stricter). Exit code 0 = all match.

Usage: python tests/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TZ", "America/New_York")
import time as _time  # noqa: E402

_time.tzset()

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _df_cell(v):
    """Normalize a pandas-rendered oracle cell: None-ify NaN/NA/NaT
    scalars, unwrap numpy scalars to Python so types (not just values)
    are visible in the raw comparison."""
    import numpy as np
    import pandas as pd

    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_df_cell(x) for x in v)
    if v is None or v is pd.NaT or (isinstance(v, float) and v != v):
        return None
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    if isinstance(v, np.generic):
        return v.item()
    return v


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if v != v else f"{v:.4f}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(repo, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    n = mod.entry(spark).count()
    print(f"entry(): {n} rows")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs, oracles = mod.queries(), mod.oracle_sql()
    bad = []
    for name in sorted(qs):
        try:
            sdf = qs[name](spark, sf)
            cols = sdf.columns
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            rows = sdf.collect()
            got = sorted("|".join(canon(r[i]) for i in order) for r in rows)
            got_raw = sorted(tuple(r) for r in rows)
            if name not in oracles:
                print(f"  {name}: rows-only, {len(rows)} rows")
                continue
            # Compare through DuckDB's pandas render (.df()), the same
            # path the real driver takes: HUGEINT aggregates become
            # float64 there (6.0 vs Spark's 6) — fetchall() hides that
            # class because Python ints compare equal. Round 1 shipped
            # 5 hash_match failures this way; never again.
            res = con.execute(oracles[name])
            ddf = res.df()
            dcols = list(ddf.columns)
            dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
            drows = [
                tuple(_df_cell(v) for v in row)
                for row in ddf.itertuples(index=False, name=None)
            ]
            want = sorted("|".join(canon(r[i]) for i in dorder) for r in drows)
            want_raw = sorted(tuple(r) for r in drows)
            if sorted(cols) != sorted(dcols):
                bad.append((name, "columns", cols, dcols))
            elif got != want:
                bad.append((name, "canon-values"))
            elif got_raw != want_raw:
                bad.append((name, "raw-values (canon ok — float repr drift)"))
        except Exception as e:  # noqa: BLE001
            bad.append((name, "error", str(e)[:140]))
    print(f"{len(qs)} queries, {len(oracles)} oracled, {len(bad)} mismatches")
    for b in bad:
        print(" MISMATCH:", b)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
