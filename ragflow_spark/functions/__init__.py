"""Scalar expression helpers re-expressing the reference's predicate
and string function surface (SURVEY.md §2.3) as Spark Column ops."""

from ragflow_spark.functions.predicates import (  # noqa: F401
    switch_predicate,
    switch_route,
    numeric_or_lexicographic_cmp,
)
