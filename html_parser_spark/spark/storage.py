"""Bucketed-table storage helpers: co-located joins without a shuffle.

At 100 TB the dominant cost of repeated joins/aggregations on the same
key is the exchange. Writing both sides bucketed (and sorted) by the
join key lets every subsequent sort-merge join and groupBy on that key
run with ZERO Exchange nodes — the bucketing IS the shuffle, paid once
at write time (the same reasoning as the checkpoint module's
bucket(conv_id) partitioning; on an Iceberg catalog this is the
`bucket(N, key)` partition transform).

test_bucketed_join_has_no_exchange asserts the plan property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(df: DataFrame, table: str, key: str,
                   buckets: int = 16) -> None:
    """Persist as a bucketed+sorted managed table keyed for co-located
    joins (Spark's native bucketing; Iceberg: bucket(N, key))."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark, table: str) -> DataFrame:
    return spark.table(table)
