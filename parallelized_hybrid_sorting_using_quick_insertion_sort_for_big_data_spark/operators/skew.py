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

    ``left_semi`` / ``left_anti`` are also exact (output: big columns
    only): every small key is replicated to EVERY salt, so a salted big
    row finds its salt-local replica iff the key exists at all — existence
    and non-existence are both salt-invariant. Right/full outer modes are
    still rejected here (an unmatched small-side row would surface once
    per replica); use :func:`salted_outer_join` for the full-outer
    composition.
    """
    if how not in (
        "inner",
        "left",
        "leftouter",
        "left_outer",
        "left_semi",
        "leftsemi",
        "semi",
        "left_anti",
        "leftanti",
        "anti",
    ):
        raise ValueError(
            f"salted_join is exact only for inner/left/semi/anti joins, got "
            f"how={how!r}: a right/full outer join replicates unmatched "
            "small-side rows n_salts times (see salted_outer_join)"
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
    if how in ("left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti"):
        return out.drop("__salt")  # semi/anti output carries big columns only
    return out.drop(big_s["__salt"]).drop(small_s["__salt"]).drop("__k_small")


def salted_outer_join(
    big: DataFrame,
    small: DataFrame,
    key_big: str,
    key_small: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-proof FULL OUTER equi-join — the mode :func:`salted_join` must
    reject, recovered exactly as a composition:

    1. the salted LEFT join (exact: inner matches + null-extended unmatched
       big rows, hot keys spread over ``n_salts`` reducers);
    2. the small-side-only remainder — small rows whose key never occurs in
       ``big`` — via an anti join against the DISTINCT big keys, emitted
       once each with null-extended big columns.

    Their union is the full outer join, row for row. The output carries
    ``big``'s columns plus ``small``'s non-key columns; ``key_big`` holds
    ``coalesce(big key, small key)`` (on small-only rows the big side is
    all-null, so the small key is the only key there is). Null join keys
    follow SQL semantics: they match nothing and surface null-extended
    from their own side.

    Scale shape: the distinct of big keys partial-aggregates map-side
    (a hot key collapses to one row per partition before the shuffle), and
    the anti join runs on unique keys — no skew on either leg. This is the
    decontamination / CDC-merge shape (``scd2_merge``'s full outer) made
    hot-key-proof.
    """
    left = salted_join(big, small, key_big, key_small, n_salts, "left")
    big_keys = big.select(F.col(key_big).alias("__k")).where(
        F.col("__k").isNotNull()
    ).distinct()
    small_only = small.join(
        big_keys, F.col(key_small) == F.col("__k"), "left_anti"
    )
    big_types = dict(zip(big.schema.names, [f.dataType for f in big.schema.fields]))
    other_big = [c for c in big.columns if c != key_big]
    small_cols = [c for c in small.columns if c != key_small]
    right_part = small_only.select(
        F.col(key_small).alias(key_big),
        *[F.lit(None).cast(big_types[c]).alias(c) for c in other_big],
        *small_cols,
    )
    return left.unionByName(right_part)


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
