"""Operator inventory (SURVEY.md §2) mapped onto Spark, plus the
training-data-pipeline operators (dedup / similarity / text analysis).

Every public operator registers itself in ``registry.QUERIES`` with an
optional DuckDB oracle SQL string; ``__spark_entry__.py`` exposes the
registry to the correctness driver.
"""

from ragflow_spark.operators import (  # noqa: F401
    analytics,
    corpus,
    dedup,
    events,
    extraction,
    hll,
    linkgraph,
    multimodal,
    relational,
    similarity,
    textops,
    trainprep,
)
from ragflow_spark.operators.registry import QUERIES, ORACLES  # noqa: F401
