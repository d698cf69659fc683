"""Structured Streaming skin over the batch operators.

The reference has no data-streaming semantics (SURVEY.md §2.5:
'streaming' there is LLM token streaming, agent/canvas.py:182-186), so
this package is Spark-native bonus: the same windowed aggregation and
sessionization shapes as operators/events.py, re-expressed over
``readStream`` with event-time watermarks and
``applyInPandasWithState`` for the custom stateful operator.
"""

from ragflow_spark.streaming.windows import (  # noqa: F401
    events_stream,
    run_to_memory,
    windowed_counts_stream,
)
from ragflow_spark.streaming.sessions import sessionize_stream  # noqa: F401
from ragflow_spark.streaming.extract_stream import (  # noqa: F401
    extract_stream,
    pages_stream,
    run_extract_stream,
)
