"""Operator modules. Importing this package populates the query registry."""

from go_web_mapreduce_spark.operators import (  # noqa: F401
    analytics,
    dedup,
    graph,
    mapreduce_compat,
    ml,
    multimodal,
    pipeline_ops,
    relational,
    similarity,
    temporal,
    text_analysis,
    udtf_ops,
)
from go_web_mapreduce_spark.streaming import events as _streaming_events  # noqa: F401
from go_web_mapreduce_spark.streaming import stateful as _streaming_stateful  # noqa: F401
