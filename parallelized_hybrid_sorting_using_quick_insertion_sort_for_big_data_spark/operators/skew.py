"""Explicit skew mitigation: salted joins and salted distinct aggregation.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
`session.get_spark`) handles most runtime skew transparently. Explicit
salting remains the right tool when:

- a single key's rows exceed what ANY one task should hold (AQE splits the
  partition, but a `count(DISTINCT)` or `collect_list` on the hot key still
  converges on one reducer);
- the skew is known ahead of time (hot tokens, null keys, celebrity users)
  and you want a deterministic plan, not a runtime rescue;
- streaming state or non-AQE engines are involved.

Both operators here are exact: they re-express the computation, never
sample or approximate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key_big: str,
    key_small: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the big side, replicate the small side.

    Each big-side row gets a deterministic salt in [0, n_salts) (hash of the
    whole row via monotonically varying xxhash64 over all columns — spreads
    a hot key across n_salts reducers); the small side is exploded n_salts×
    so every (key, salt) bucket finds its match. Exact ONLY for inner/left
    joins on unique small-side keys — a right/full outer join would emit
    every unmatched small-side row n_salts times (one per exploded salt), so
    those modes are rejected. The replication factor is the explicit price
    (n_salts × |small| rows shuffled) traded for eliminating the hot-key
    straggler. The small side's key column is dropped from the output
    (it equals ``key_big`` on every surviving row), so equal key names never
    produce ambiguous duplicate columns.

    The small side is hinted away from broadcast: if it fit the broadcast
    threshold you would broadcast it (itself skew-proof — no shuffle of the
    big side at all) instead of paying for salting; auto-broadcast would
    otherwise silently turn this operator into pure overhead at test scale
    while the plan it is designed for (big-vs-unbroadcastable) never runs.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join is exact only for inner/left joins, got how={how!r}: "
            "a right/full outer join replicates unmatched small-side rows "
            "n_salts times"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)).alias("__salt")
    big_s = big.withColumn("__salt", salt)
    small_s = (
        small.withColumnRenamed(key_small, "__k_small")
        .withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
        .hint("shuffle_hash")
    )
    out = big_s.join(
        small_s,
        (F.col(key_big) == F.col("__k_small")) & (big_s["__salt"] == small_s["__salt"]),
        how,
    )
    return out.drop(big_s["__salt"]).drop(small_s["__salt"]).drop("__k_small")


def salted_distinct_count(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = 16,
) -> DataFrame:
    """Exact count(DISTINCT value) per key without funneling any key's
    values through one reducer.

    Phase 1: distinct (key, value) — shuffled by (key, salt(value)), so a
    hot key's distinct set spreads over n_salts partitions; each partial
    counts its shard. Phase 2: sum the n_salts partials per key (n_salts
    rows per key — trivial). Distinctness is preserved because salt is a
    pure function of value: equal values always land in the same shard.
    Output: (key, n_distinct).
    """
    salt = F.pmod(F.xxhash64(F.col(value)), F.lit(n_salts))
    partials = (
        df.select(F.col(key), F.col(value), salt.alias("__salt"))
        .distinct()  # shuffles by (key, value, salt) = fine-grained
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__part"))
    )
    return partials.groupBy(key).agg(F.sum("__part").alias("n_distinct"))
