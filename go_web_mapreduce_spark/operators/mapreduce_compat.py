"""Queries exercising the programmable map/reduce compatibility surface
(core.py): the reference's flagship word count submitted as an *algorithm*
(user callables), verified against plain SQL — proving the open-coded slots
produce the same answer as the native path (SURVEY.md §2.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_web_mapreduce_spark.core import wordcount_algorithm
from go_web_mapreduce_spark.functions.text import tokens
from go_web_mapreduce_spark.registry import query
from go_web_mapreduce_spark.sources.tables import load_table


@query(
    "q_mr_wordcount",
    oracle="""
    SELECT word AS key, count(*)::varchar AS value
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
    description="word count through submit_algorithm (python map/reduce "
    "callables; reference: server/views.go:51-61). Values are strings, as the "
    "reference's reduce emits (server/views.go:58).",
)
def q_mr_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.lit("").alias("key"), F.explode(tokens("text")).alias("value")
    )
    return wordcount_algorithm(words, input_len=10_000, num_partitions=8)
