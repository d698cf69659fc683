"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet, compare row count + sorted column names + an
order-insensitive multiset of stringified rows (FIXTURES.md §4).

Runs at sf0.001 for speed; the driver runs sf0.01.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.4f}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def _rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


ORACLED = sorted(set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = entrymod.queries()[name]
    sdf = q(spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    spark_rows = _rows_multiset(sdf.columns, sdf.collect())

    res = duck.execute(entrymod.oracle_sql()[name])
    duck_cols_raw = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    duck_cols = sorted(duck_cols_raw)

    assert spark_cols == duck_cols, f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    duck_ms = _rows_multiset(duck_cols_raw, duck_rows)
    mismatches = [
        (a, b) for a, b in zip(spark_rows, duck_ms) if a != b
    ]
    assert not mismatches, f"{name}: first diffs {mismatches[:3]}"


def test_rows_only_queries_run(spark, sf_dir):
    qs = entrymod.queries()
    for name in sorted(set(qs) - set(ORACLED)):
        n = qs[name](spark, sf_dir).count()
        assert n >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "url" in df.columns
