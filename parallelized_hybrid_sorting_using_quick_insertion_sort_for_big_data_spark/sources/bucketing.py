"""Bucketed-table support: co-located, exchange-free joins.

At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders) is
shuffling both sides on the key. Bucketing pre-partitions the data BY the
join key at write time — `bucketBy(n, key) + sortBy(key)` — so Spark reads
both sides already hash-partitioned and sorted: the sort-merge join plans
with ZERO Exchange and zero Sort (asserted in tests/test_bucketing.py).

The write is a one-time cost amortized over every subsequent keyed join or
aggregation; this is the Spark-native analogue of the reference's ambition
to pre-place data per processor (sendcounts/displs planning,
QuickInsertionHeap.c:164-178) — except persistent and declarative.

Bucket-count guidance at scale: pick n_buckets so each bucket file lands in
the 128–512 MB range (buckets are not splittable per-file); both join sides
must use the SAME bucket count (or an integer multiple) for exchange-free
planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist `df` as a bucketed+sorted managed table (saveAsTable is
    required: bucket metadata lives in the catalog, plain path writes lose
    it)."""
    # one FILE per bucket is required for Spark to trust the per-bucket sort
    # order at read time (multi-file buckets force a Sort before merge join):
    # repartition on the bucket key so each bucket is written by one task
    writer = (
        df.repartition(n_buckets, *bucket_cols)
        .write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
    )
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans as a
    sort-merge join with no shuffle and no sort on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
