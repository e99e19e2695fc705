"""Behavioral event analytics: ordered-step funnels and cohort retention
(extension layer, SURVEY §2c — the session/user-journey OLAP queries every
event warehouse runs; the reference's engine has no equivalent, so these are
expressed Spark-first from scratch).

Scale shape (the only one that survives 100 TB):

- ``funnel`` makes ONE shuffle: events are pre-filtered to the step types
  (predicate pushed into the scan), grouped by user, and the per-user
  cascade is a JVM higher-order-function fold (``sort_array`` +
  ``F.aggregate``) over that user's step events — no Python UDF, no
  repeated self-joins (the naive k-step form is k joins ≡ k shuffles).
  Per-user state is k timestamps regardless of history length; the
  collected list is bounded by the user's *step-type* events only.
- ``cohort_retention`` computes first-seen via a window over the same
  user-partitioned shuffle the dedup needs anyway, then aggregates
  (cohort, offset) — shuffles carry (user, date) pairs, never raw events.

Funnel semantics (cascade-earliest, the ClickHouse ``windowFunnel``/
Amplitude convention): t1 = earliest step-1 event; t_i = earliest step-i
event STRICTLY after t_{i-1}. Deterministic under timestamp ties because
conditions compare timestamp VALUES, not sequence positions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Cascade-earliest funnel over ``steps`` (ordered event types).

    Output: one row per user appearing in any step-type event —
    (user_col, step1_ts .. stepK_ts, steps_completed). ``step_i_ts`` is the
    earliest event of type ``steps[i]`` strictly after ``step_{i-1}_ts``
    (NULL if the cascade stops); ``steps_completed`` counts the non-null
    prefix.

    One shuffle: filter to step types → groupBy(user) →
    ``sort_array(collect_list(struct(ts, type)))`` → ``F.aggregate`` fold
    carrying k timestamps. The fold reads the PREVIOUS accumulator for every
    slot, so one event can never satisfy two adjacent steps (strict-``>``
    needs a strictly later timestamp anyway).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    k = len(steps)
    ev = events.where(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).cast("timestamp").alias("__ts"),
        F.col(type_col).alias("__t"),
    )
    per_user = ev.groupBy("__u").agg(
        F.sort_array(F.collect_list(F.struct("__ts", "__t"))).alias("__seq")
    )

    init = F.array(*[F.lit(None).cast("timestamp") for _ in range(k)])

    def step_update(acc: Column, e: Column) -> Column:
        slots = []
        for i, st in enumerate(steps):
            cond = e["__t"] == F.lit(st)
            if i > 0:
                cond = cond & acc[i - 1].isNotNull() & (e["__ts"] > acc[i - 1])
            slots.append(F.coalesce(acc[i], F.when(cond, e["__ts"])))
        return F.array(*slots)

    folded = per_user.select(
        "__u", F.aggregate("__seq", init, step_update).alias("__acc")
    )
    out_cols = [F.col("__u").alias(user_col)]
    out_cols += [F.col("__acc")[i].alias(f"step{i + 1}_ts") for i in range(k)]
    out_cols.append(
        F.size(F.filter("__acc", lambda x: x.isNotNull())).alias("steps_completed")
    )
    return folded.select(*out_cols)


def funnel_counts(funnel_df: DataFrame, n_steps: int) -> DataFrame:
    """Collapse a per-user funnel into the step-conversion table:
    (step, n_users, conversion_from_prev). Tiny output (k rows) — a single
    partial-aggregated pass over the per-user rows."""
    aggs = [
        F.sum((F.col("steps_completed") >= i).cast("bigint")).alias(f"__n{i}")
        for i in range(1, n_steps + 1)
    ]
    wide = funnel_df.agg(*aggs)
    def conv(i: int) -> Column:
        if i == 1:
            return F.lit(1.0)
        return F.round(
            F.col(f"__n{i}") / F.nullif(F.col(f"__n{i - 1}"), F.lit(0)), 9
        )

    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("step"),
                F.col(f"__n{i}").alias("n_users"),
                conv(i).alias("conversion_from_prev"),
            )
            for i in range(1, n_steps + 1)
        ]
    )
    return (
        wide.select(F.explode(rows).alias("r"))
        .select("r.step", "r.n_users", "r.conversion_from_prev")
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic retention matrix: users are cohorted by their first-seen
    calendar date; each (cohort, day-offset) cell counts distinct users from
    that cohort active that many days after first touch.

    Output: (cohort_date TIMESTAMP, day_offset INT, n_active BIGINT,
    cohort_size BIGINT, retention_frac DOUBLE). ``cohort_date`` is emitted
    as TIMESTAMP (not DATE) so downstream engines agree on the dtype.

    Plan: one shuffle by user (window min — the same partitioning the
    per-user distinct needs), one shuffle for the (cohort, offset) distinct
    + count, and a trivially small window over the aggregated matrix for
    cohort size. Shuffled payloads are (user, date) pairs, never events.
    """
    d = F.to_date(ts_col)
    w_user = Window.partitionBy("__u")
    active = (
        events.select(F.col(user_col).alias("__u"), d.alias("__d"))
        .withColumn("__cohort", F.min("__d").over(w_user))
        .select(
            "__cohort",
            F.datediff(F.col("__d"), F.col("__cohort")).alias("day_offset"),
            "__u",
        )
        .distinct()
    )
    matrix = active.groupBy("__cohort", "day_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    w_cohort = Window.partitionBy("__cohort")
    return (
        matrix.withColumn(
            "cohort_size",
            F.max(F.when(F.col("day_offset") == 0, F.col("n_active"))).over(w_cohort),
        )
        .select(
            F.col("__cohort").cast("timestamp").alias("cohort_date"),
            "day_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 9).alias(
                "retention_frac"
            ),
        )
    )


def copurchase_similarity(
    baskets: DataFrame,
    entity_col: str = "cust",
    item_col: str = "part",
    min_support: int = 5,
    max_basket: int = 256,
) -> DataFrame:
    """Item-item co-occurrence similarity from (entity, item) baskets —
    the recommender primitive ("customers who bought A also bought B"):
    cosine(a, b) = n_ab / sqrt(n_a · n_b) over co-occurrence counts.

    Scale discipline (the DIMSUM problem): an entity holding k items emits
    C(k, 2) candidate pairs, so ONE bot basket with 10^5 items would emit
    5·10^9 pairs. ``max_basket`` drops entities above the cap BEFORE the
    self-join (the same hot-key pruning as the Jaccard stop-shingle cap —
    a basket that large carries ~zero similarity signal per pair anyway);
    ``min_support`` prunes the long tail after counting. Everything is an
    equi-join on the entity plus grouped counts — no cross join, map-side
    partials throughout."""
    if min_support < 1 or max_basket < 2:
        raise ValueError(
            f"min_support >= 1 and max_basket >= 2 required, got "
            f"{min_support}, {max_basket}"
        )
    from pyspark.sql import Window

    w = Window.partitionBy(entity_col)
    capped = (
        baskets.withColumn("__bk", F.count(F.lit(1)).over(w))
        .where(F.col("__bk") <= max_basket)
        .drop("__bk")
    )
    sizes = capped.groupBy(item_col).agg(F.count(F.lit(1)).alias("n_i"))
    a = capped.select(F.col(entity_col).alias("__e"), F.col(item_col).alias("part_a"))
    b = capped.select(F.col(entity_col).alias("__e"), F.col(item_col).alias("part_b"))
    co = (
        a.join(b, "__e")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_support)
    )
    sa = sizes.select(F.col(item_col).alias("part_a"), F.col("n_i").alias("n_a"))
    sb = sizes.select(F.col(item_col).alias("part_b"), F.col("n_i").alias("n_b"))
    return (
        co.join(sa, "part_a")
        .join(sb, "part_b")
        .select(
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(
                F.col("n_ab").cast("double")
                / F.sqrt((F.col("n_a") * F.col("n_b")).cast("double")),
                9,
            ).alias("cosine"),
        )
    )
