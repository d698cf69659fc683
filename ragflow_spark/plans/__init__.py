"""Spark DataFrame programs: the extraction pipeline + checkpointing."""

from ragflow_spark.plans.pipeline import (  # noqa: F401
    assign_splits,
    compute_hot_hosts,
    extract_pages,
    metrics_for,
    chunks_of,
)
from ragflow_spark.plans.checkpoint import run_resumable  # noqa: F401
