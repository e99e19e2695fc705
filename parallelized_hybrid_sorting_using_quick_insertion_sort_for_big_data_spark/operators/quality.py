"""Data-quality audit: the validation pass a pipeline runs before trusting
a lake — primary-key uniqueness, null rates, referential integrity (FK
orphans), and domain checks, emitted as one uniform (check, bad, total)
relation.

The reference has no notion of data validation (SURVEY.md §2b: its only
integrity device is the INT_MAX sentinel, quickThreshold.c:169-172);
this is extension-layer breadth for the 100 TB posture: at that scale you
cannot eyeball data, you audit it.

Shapes (all exact integer counts, trivially oracle-checkable):
- uniqueness: groupBy(key) HAVING count>1 → count of violating keys; at
  scale one keyed exchange of pre-aggregated rows.
- null rate: conditional count, zero shuffle beyond the single partial-agg
  exchange.
- FK orphans: LEFT ANTI join child→parent on the key; parent sides that
  are dimension-sized broadcast, fact-fact checks shuffle on the key —
  the same join machinery every query already uses, repurposed as a
  validator.
- domain: predicate violation counts, scan-evaluable.

Each check is one small DataFrame; the audit unions them. Counts are
computed per check rather than in one mega-pass so each check keeps its
own optimal plan (a broadcast anti join and a partial-agg count don't
share a useful common subplan anyway).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _one(name: str, bad: DataFrame, total: int | None = None) -> DataFrame:
    agg = bad.agg(F.count(F.lit(1)).cast("bigint").alias("bad"))
    out = agg.select(F.lit(name).alias("check_name"), "bad")
    if total is not None:
        out = out.withColumn("total", F.lit(total).cast("bigint"))
    return out


def uniqueness_check(df: DataFrame, key: str | list[str], name: str) -> DataFrame:
    """Count of key values that occur more than once."""
    keys = [key] if isinstance(key, str) else list(key)
    dups = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n")).where(F.col("n") > 1)
    return _one(name, dups)


def null_check(df: DataFrame, col: str, name: str) -> DataFrame:
    """Count of rows where ``col`` is NULL."""
    return _one(name, df.where(F.col(col).isNull()))


def fk_orphan_check(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str, name: str
) -> DataFrame:
    """Count of child rows whose non-null FK has no parent row (LEFT ANTI
    join — broadcast when the parent is dimension-sized, keyed shuffle
    otherwise; AQE picks per actual size)."""
    orphans = child.where(F.col(child_key).isNotNull()).join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        on=child_key,
        how="left_anti",
    )
    return _one(name, orphans)


def domain_check(df: DataFrame, violation: Column, name: str) -> DataFrame:
    """Count of rows violating a domain predicate (pass the VIOLATION
    condition, e.g. ``col('l_discount') < 0``)."""
    return _one(name, df.where(violation))


def audit(checks: list[DataFrame]) -> DataFrame:
    """Union the per-check one-row frames into the audit report."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
