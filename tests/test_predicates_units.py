"""Unit tests: the Switch predicate language edge cases
(reference agent/component/switch.py:90-129 semantics) and the
size-proportional hot-host salting math."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def vals(spark):
    rows = [
        ("10",), ("9",), ("abc",), ("Abc",), ("",), (None,), ("10.5",), ("-3",),
    ]
    return spark.createDataFrame(rows, "v string")


def _passing(vals, pred):
    return sorted(
        r["v"] for r in vals.filter(pred).collect() if True
    )


def test_numeric_compare_beats_lexicographic(spark, vals):
    """'10' > '9' numerically even though '10' < '9' lexicographically
    (switch.py:110-128 float-first semantics)."""
    from ragflow_spark.functions.predicates import switch_predicate

    assert "10" in _passing(vals, switch_predicate(F.col("v"), ">", "9"))
    assert "9" not in _passing(vals, switch_predicate(F.col("v"), ">", "9"))
    assert "-3" in _passing(vals, switch_predicate(F.col("v"), "<", "0"))


def test_lexicographic_fallback_for_non_numeric(spark, vals):
    from ragflow_spark.functions.predicates import switch_predicate

    got = _passing(vals, switch_predicate(F.col("v"), ">", "Z"))
    assert "abc" in got  # 'abc' > 'Z' as strings
    assert "Abc" not in got  # 'Abc' < 'Z'


def test_contains_is_case_insensitive(spark, vals):
    from ragflow_spark.functions.predicates import switch_predicate

    got = _passing(vals, switch_predicate(F.col("v"), "contains", "AB"))
    assert set(got) == {"abc", "Abc"}


def test_empty_matches_null_and_blank(spark, vals):
    from ragflow_spark.functions.predicates import switch_predicate

    n = vals.filter(switch_predicate(F.col("v"), "empty")).count()
    assert n == 2  # '' and NULL


def test_route_first_match_wins(spark, vals):
    from ragflow_spark.functions.predicates import switch_predicate, switch_route

    route = switch_route(
        [
            (switch_predicate(F.col("v"), "contains", "a"), "has_a"),
            (switch_predicate(F.col("v"), "not empty"), "nonempty"),
        ],
        default="other",
    )
    got = {r["v"]: r["r"] for r in vals.select("v", route.alias("r")).collect()}
    assert got["abc"] == "has_a"  # matched first despite also nonempty
    assert got["10"] == "nonempty"
    assert got[""] == "other" and got[None] == "other"


def test_unknown_operator_raises():
    from ragflow_spark.functions.predicates import switch_predicate

    with pytest.raises(ValueError):
        switch_predicate(F.lit("x"), "regexmatch", "y")


def test_hot_host_factors_are_size_proportional(spark):
    """ceil(host_pages / target) per oversized host; small hosts
    absent (factor 1 implied)."""
    from ragflow_spark.plans.pipeline import compute_hot_hosts

    rows = (
        [(f"https://big.com/{i}",) for i in range(60)]
        + [(f"https://mid.com/{i}",) for i in range(25)]
        + [(f"https://s{i}.com/0",) for i in range(15)]
    )
    pages = spark.createDataFrame(rows, "url string")
    # 100 pages, 10 splits -> target 10/split
    hot = compute_hot_hosts(pages, n_splits=10)
    assert hot == {"big.com": 6, "mid.com": 3}
