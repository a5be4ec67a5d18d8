from go_web_mapreduce_spark.streaming.events import (  # noqa: F401
    hourly_rollup_stream,
    stream_events,
)
