"""Bucketed tables — shuffle-free co-located joins.

At 100 TB the dominant join cost is shuffling both sides by the join key.
Bucketing pre-partitions the *stored* table by key hash so a join between
two tables bucketed on the same key with the same bucket count needs NO
exchange at query time — each task zips matching buckets. This is the
storage-level sibling of the runtime choices the engine already makes
(broadcast for small dims, AQE for the rest): pay the shuffle once at write
time, amortize it over every subsequent join.

Spark bucketing requires a saveAsTable metastore entry (bucket metadata
lives in the catalog, not the parquet footers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted-within-bucket)
    catalog table. Joins/aggregations on ``bucket_col`` between tables with
    the same bucketing skip their exchanges (and their sorts, when sorted)."""
    if num_buckets <= 0:
        raise ValueError("num_buckets must be positive")
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key. With equal
    bucket counts the planner emits a SortMergeJoin with no Exchange on
    either side (verified in tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
