"""Operator modules. Importing this package populates the query registry."""

from go_web_mapreduce_spark.operators import (  # noqa: F401
    relational,
)
