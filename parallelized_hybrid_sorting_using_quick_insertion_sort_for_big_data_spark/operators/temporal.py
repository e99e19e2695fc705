"""Temporal joins Spark lacks as built-ins: as-of join and bounded range
join — composed from existing DataFrame ops (no UDFs), per the engine rule
that custom operators are expression compositions first.

Scale design:
- ``asof_join`` uses the union trick: tag both sides, union, one window per
  key carrying the last-seen right row forward. ONE shuffle on the key —
  never a per-key sort-merge of two separate relations, never a correlated
  subquery per row. This is how production time-series stores (kdb-style
  asof, Flink temporal join) shape the computation.
- ``range_join`` blocks both sides onto a time-bucket grid sized by the
  tolerance, equi-joins on (key, bucket), then applies the exact predicate.
  Each true pair materializes exactly once (the left row's bucket is a
  single grid cell, the right row covers it once), so no dedup pass. The
  candidate volume is |pairs within ~3·tol|, not |left|×|right| per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    prefix: str = "prev_",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` within the same ``by`` group (inclusive, the
    ASOF-join standard). Right ``value_cols`` arrive prefixed; rows with no
    earlier right row keep nulls (left-join semantics).

    All ``value_cols`` travel as ONE struct carried by a single
    ``last(ignorenulls)`` — per-column carries could mix columns from two
    different right rows whenever a value column holds a null. Ties on
    ``right_ts`` within a key resolve deterministically to the maximum
    struct (field-lexicographic), encoded in the window ordering — unless a
    value column's type is unorderable (contains a map), in which case the
    struct cannot appear in ORDER BY: the join still works atomically, but
    which of several SAME-timestamp right rows wins is then
    partition-order-dependent (give such data a distinct ``right_ts`` or an
    orderable surrogate column if that matters).
    """
    from pyspark.sql.types import ArrayType, MapType, StructField, StructType

    def _orderable(dt) -> bool:
        if isinstance(dt, MapType):
            return False
        if isinstance(dt, StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        if isinstance(dt, ArrayType):
            return _orderable(dt.elementType)
        return True

    left_payload = [c for c in left.columns if c not in by and c != left_ts]
    r_struct_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    l2 = left.select(
        *by,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_l"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r2 = right.select(
        *by,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_l"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__r"),
    )
    # right rows sort BEFORE left rows at equal ts => ties are inclusive;
    # "__r" as the final sort key makes equal-right_ts ties deterministic
    # (last() then picks the struct-maximum right row, atomically).
    order = ["__ts", "__is_l"]
    if all(_orderable(f.dataType) for f in r_struct_type.fields):
        order.append(F.col("__r").asc_nulls_first())
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l2.unionByName(r2).select(
        "*", F.last("__r", ignorenulls=True).over(w).alias("__carried")
    )
    return (
        carried.where(F.col("__is_l") == 1)
        .select(
            "*",
            *[F.col(f"__carried.{c}").alias(f"{prefix}{c}") for c in value_cols],
        )
        .drop("__is_l", "__r", "__carried")
        .withColumnRenamed("__ts", left_ts)
    )


def resample_gapfill(
    df: DataFrame,
    by: list[str],
    ts_col: str,
    value_col: str,
    bucket_us: int,
    round_digits: int = 9,
) -> DataFrame:
    """Regularize an event stream onto a fixed time grid per key: bucket to
    ``bucket_us`` intervals, aggregate (count + exact decimal mean), emit a
    DENSE row per grid cell between each key's first and last bucket, and
    carry the last observed mean forward across gaps (`filled_value`;
    `is_gap` marks interpolated cells).

    Scale shape: aggregation shuffles (key, bucket) — linear in events; the
    spine (per-key min/max + ``sequence`` explode) is bounded by
    time-span/bucket per key, NOT by event count; the gap-fill is one
    window per key over already-aggregated rows. No driver logic, no UDFs.
    A key's dense grid lands in one partition — size ``bucket_us`` so
    span/bucket stays ≪ task memory (e.g. a year of minutes = 525 600 rows
    per key, fine; a year of milliseconds is not).
    """
    bucket = F.expr(
        f"(unix_micros({ts_col}) - pmod(unix_micros({ts_col}), {bucket_us}))"
        f" div {bucket_us}"
    ).alias("__bk")
    agg = df.groupBy(*by, bucket).agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.sum(F.col(value_col).cast("decimal(27,8)")).cast("double")
            / F.count(F.lit(1))
        ).alias("__avg"),
    )
    spine = (
        agg.groupBy(*by)
        .agg(F.min("__bk").alias("__lo"), F.max("__bk").alias("__hi"))
        .select(*by, F.explode(F.sequence("__lo", "__hi")).alias("__bk"))
    )
    j = spine.join(agg, [*by, "__bk"], "left")
    w = (
        Window.partitionBy(*by)
        .orderBy("__bk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        *by,
        F.timestamp_micros(F.col("__bk") * bucket_us).alias("bucket_start"),
        F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("n_events"),
        F.round(F.col("__avg"), round_digits).alias("avg_value"),
        F.round(F.last("__avg", ignorenulls=True).over(w), round_digits).alias(
            "filled_value"
        ),
        F.col("n_events").isNull().alias("is_gap"),
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts_us: str,
    right_ts_us: str,
    tolerance_us: int,
) -> DataFrame:
    """All (left, right) pairs in the same ``by`` group with
    |left_ts - right_ts| <= tolerance (timestamps as integer micros).
    Output: all left columns + all right columns + ``delta_us`` =
    right_ts - left_ts. Grid-blocked: never a per-key cross join."""
    width = tolerance_us

    def _floor_div(x: str) -> str:
        # exact FLOOR division in pure integer arithmetic: `div` truncates
        # toward zero, which disagrees with floor for negative operands
        # (pre-epoch timestamps, or t - tolerance < 0); pmod's non-negative
        # remainder makes (x - pmod(x, w)) exactly divisible by w.
        return f"(({x}) - pmod(({x}), {width})) div {width}"

    # integer arithmetic throughout, not float division: micro-epochs are
    # near the double mantissa edge and bucket ids must be exact
    lb = left.withColumn("__b", F.expr(_floor_div(left_ts_us)))
    # a right row can match left rows in buckets floor((t-tol)/w)..floor((t+tol)/w)
    rb = right.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.expr(_floor_div(f"{right_ts_us} - {tolerance_us}")),
                F.expr(_floor_div(f"{right_ts_us} + {tolerance_us}")),
            )
        ),
    )
    joined = lb.join(rb, [*by, "__b"]).where(
        F.abs(F.col(right_ts_us) - F.col(left_ts_us)) <= tolerance_us
    )
    return joined.drop("__b").withColumn(
        "delta_us", F.col(right_ts_us) - F.col(left_ts_us)
    )
