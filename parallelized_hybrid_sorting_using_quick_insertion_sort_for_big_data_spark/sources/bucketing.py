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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


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


# ---------------------------------------------------------------------------
# Z-order (Morton) layout clustering
# ---------------------------------------------------------------------------

#: Magic-number bit-spread masks for interleaving a 16-bit value into the
#: even bit positions of a 32-bit lane (the classic Morton construction).
_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` so bit i lands at position 2i.
    Pure integer shifts/masks — exact in any engine.

    The input is cast to LONG first: on IntegerType the spread reaches bit
    31 (the int32 sign bit), flipping codes negative and disagreeing with
    the all-BIGINT DuckDB mirror."""
    out = col.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        out = (out.bitwiseOR(F.shiftleft(out, shift))).bitwiseAND(F.lit(mask))
    return out


def zorder_code(x: Column, y: Column) -> Column:
    """32-bit Morton code interleaving the low 16 bits of two non-negative
    dimensions (x in even bits, y in odd bits).

    Sorting/range-partitioning by this code clusters rows that are close in
    BOTH dimensions into the same files, so per-file min/max statistics
    prune scans filtered on EITHER column — the data-layout trick behind
    lakehouse OPTIMIZE ZORDER. A plain sort by (x, y) only prunes on the
    leading column; the Morton curve bounds every file in both dimensions
    at once."""
    return _spread16(x).bitwiseOR(F.shiftleft(_spread16(y), 1))


def _spread16_sql(expr: str) -> str:
    out = f"(({expr}) & 65535)"
    for shift, mask in _SPREAD_STEPS:
        out = f"(({out} | ({out} << {shift})) & {mask})"
    return out


def zorder_code_sql(x_expr: str, y_expr: str) -> str:
    """DuckDB mirror of :func:`zorder_code` — generated from the same
    spread steps, all-BIGINT arithmetic."""
    return f"({_spread16_sql(x_expr)} | ({_spread16_sql(y_expr)} << 1))"


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    num_files: int = 16,
) -> None:
    """Write ``df`` clustered along the Morton curve of (x_col, y_col):
    range-partition on the z-code (balanced files via range boundary
    sampling), sort within each partition, write parquet. Each output
    file then covers a tight bounding box in BOTH dimensions, so parquet
    footer min/max stats prune on either column's predicate. One range
    exchange — same cost as any total sort of the data being laid out."""
    z = zorder_code(F.col(x_col), F.col(y_col)).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
