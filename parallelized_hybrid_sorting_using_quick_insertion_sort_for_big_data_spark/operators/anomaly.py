"""Robust per-group outlier detection — median/MAD z-scores (extension
layer, SURVEY §2c). The data-quality gate a training pipeline runs before
trusting numeric telemetry: mean/stddev break under the very outliers being
hunted, so the robust form (median absolute deviation, Iglewicz-Hoaglin
modified z-score, 0.6745 consistency constant) is the one that matters.

Scale shape:

- Two grouped aggregations (median of value, then median of absolute
  deviation) — each a single shuffle of (group, value) pairs with partial
  aggregation; the per-group stats relations are ONE ROW PER GROUP and are
  explicitly broadcast back, so the event stream itself never shuffles.
- Exact `percentile` needs the group's values collected per partition —
  right up to groups of ~10^8 values; beyond that pass ``approx=True`` to
  swap `percentile` for `percentile_approx` (mergeable quantile sketch,
  rank error ≤ 1/accuracy, constant memory per group) — the documented
  100 TB tier, implemented as a parameter on the same two-shuffle plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Iglewicz-Hoaglin consistency constant: MAD ≈ 0.6745·σ for a normal
# distribution, so 0.6745·dev/MAD is comparable to a classic z-score.
MAD_Z = 0.6745


def _median(col: str, approx: bool = False, accuracy: int = 10000) -> Column:
    if approx:
        return F.percentile_approx(col, 0.5, accuracy)
    return F.expr(f"percentile({col}, 0.5D)")


def robust_group_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group (median, MAD): two grouped aggregations, second over
    absolute deviations from the first. Output: group_cols, med, mad.

    ``approx=True`` swaps exact ``percentile`` (which buffers each group's
    values — fine to ~10^8 values per group) for ``percentile_approx``
    (Greenwald-Khanna-style mergeable sketch, rank error ≤ 1/accuracy,
    constant memory per group) — the 100 TB tier, where a hot group no
    longer bounds executor memory. Same two-shuffle plan either way."""
    g = list(group_cols)
    med = df.groupBy(*g).agg(_median(value_col, approx, accuracy).alias("med"))
    dev = df.join(F.broadcast(med), g).withColumn(
        "__dev", F.abs(F.col(value_col) - F.col("med"))
    )
    return dev.groupBy(*g).agg(
        F.first("med").alias("med"), _median("__dev", approx, accuracy).alias("mad")
    )


def robust_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: float = 3.5,
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Rows whose modified z-score ``0.6745·(x - med)/MAD`` exceeds ``k``
    in absolute value within their group (3.5 is the Iglewicz-Hoaglin
    recommendation). Groups with MAD = 0 (over half the values identical)
    yield no outliers by this criterion — their z is null, not infinite.

    Output: the input columns + med, mad, robust_z (z rounded to 6 so the
    engine-boundary last-ulp of the interpolated medians can't flip the
    comparison hash).

    ``approx=True`` selects the sketch-based median tier (see
    :func:`robust_group_stats`); the flagged set then differs from exact
    only for rows whose |z| sits within the sketch's rank error of ``k``
    — pytest pins that bound."""
    g = list(group_cols)
    stats = robust_group_stats(df, g, value_col, approx, accuracy)
    z = F.round(
        F.lit(MAD_Z)
        * (F.col(value_col) - F.col("med"))
        / F.nullif(F.col("mad"), F.lit(0.0)),
        6,
    )
    return (
        df.join(F.broadcast(stats), g)
        .withColumn("robust_z", z)
        .where(F.abs(F.col("robust_z")) > k)
        .withColumn("med", F.round("med", 6))
        .withColumn("mad", F.round("mad", 6))
    )
