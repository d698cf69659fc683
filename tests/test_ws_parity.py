"""Regression for the round-2 advice: Java regex \\s includes \\x0B,
RE2's does not — every shared pattern must use the explicit WS_CLASS
so a vertical tab can never split a query from its oracle."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

VT_TEXT = "alpha\x0bbeta gamma\tdelta epsilon"


def test_trunc_pattern_agrees_on_vertical_tab(spark):
    from ragflow_spark.operators.textops import _TRUNC_PATTERN, TOKEN_PATTERN

    df = spark.createDataFrame([(VT_TEXT,)], "text string").select(
        F.regexp_extract("text", _TRUNC_PATTERN, 1).alias("t"),
        F.regexp_count("text", F.lit(TOKEN_PATTERN)).alias("n"),
    )
    row = df.collect()[0]
    con = duckdb.connect()
    dt, dn = con.execute(
        "SELECT regexp_extract(?, ?, 1), len(regexp_extract_all(?, ?))",
        [VT_TEXT, _TRUNC_PATTERN, VT_TEXT, TOKEN_PATTERN],
    ).fetchone()
    assert row.t == dt
    assert row.n == dn


def test_fingerprint_ws_agrees_on_vertical_tab(spark):
    from ragflow_spark.operators.textops import WS_CLASS

    df = spark.createDataFrame([(VT_TEXT,)], "text string").select(
        F.md5(F.lower(F.regexp_replace("text", WS_CLASS + "+", " "))).alias("fp")
    )
    con = duckdb.connect()
    (dfp,) = con.execute(
        f"SELECT md5(lower(regexp_replace(?, '{WS_CLASS}+', ' ', 'g')))",
        [VT_TEXT],
    ).fetchone()
    assert df.collect()[0].fp == dfp
