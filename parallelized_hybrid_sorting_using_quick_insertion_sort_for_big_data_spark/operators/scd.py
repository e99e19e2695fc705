"""Slowly-changing-dimension (type 2) merge — the warehouse MERGE pattern
expressed as plain DataFrame set algebra (no table-format dependency).

A 100 TB lake tracks dimension history by VERSIONING rows, not updating
them: each key owns a chain of rows with [valid_from, valid_to) intervals
and one open (is_current) row. Applying a batch of updates must (a) close
the open row of every key whose tracked attributes actually changed,
(b) insert the new open version, (c) pass no-op updates through untouched
(no version churn), and (d) never touch closed history.

Scale shape: ONE equi-join between the open slice and the update batch
(both sides narrowed to key + tracked columns), then unions — no windows
over the whole history, no per-key loops. Closed history streams through
untouched (union is a zero-shuffle concatenation), so cost is bounded by
|open rows ⋈ updates|, not by |history|. On a real lake the output
replaces the dimension snapshot atomically (table-format commit or
directory swap); the merge logic itself is format-agnostic.

The reference has no mutation concept at all (it sorts immutable arrays);
this module is part of the LLM-pipeline extension layer — training-data
dimension tables (source registry, license status, quality tier) need
exactly this history-preserving update.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    snapshot: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    change_ts_us: int,
) -> DataFrame:
    """Apply ``updates`` (one row per key: the key column + new values for
    every ``tracked`` column) to an SCD2 ``snapshot`` carrying
    ``valid_from_us``, ``valid_to_us`` (null = open) and ``is_current``.

    Returns the merged snapshot:

    - closed history rows: unchanged, streamed through;
    - open rows whose key has a DIFFERING update: closed at
      ``change_ts_us`` + a new open row with the updated values;
    - open rows with an identical (no-op) update or no update: unchanged
      — idempotent re-application creates zero new versions;
    - keys new to the dimension: inserted open at ``change_ts_us``.

    Null semantics: attribute comparison is null-safe (``eqNullSafe``), so
    null → value and value → null count as changes and null → null does
    not.
    """
    meta = ["valid_from_us", "valid_to_us", "is_current"]
    attrs = [c for c in snapshot.columns if c not in meta and c != key]
    closed = snapshot.where(~F.col("is_current"))
    open_rows = snapshot.where(F.col("is_current"))

    u = updates.select(
        F.col(key).alias("__k"), *[F.col(c).alias(f"__u_{c}") for c in tracked]
    )
    j = open_rows.join(u, open_rows[key] == F.col("__k"), "full_outer")

    same = None
    for c in tracked:
        eq = F.col(c).eqNullSafe(F.col(f"__u_{c}"))
        same = eq if same is None else same & eq

    has_open = F.col(key).isNotNull()
    has_upd = F.col("__k").isNotNull()

    # open rows kept as-is: no update for the key, or a no-op update
    kept = j.where(has_open & (~has_upd | same)).select(*snapshot.columns)
    # changed: old version closes at change_ts
    closed_now = (
        j.where(has_open & has_upd & ~same)
        .select(
            *[F.col(c) for c in [key] + attrs],
            F.col("valid_from_us"),
            F.lit(change_ts_us).cast("long").alias("valid_to_us"),
            F.lit(False).alias("is_current"),
        )
        .select(*snapshot.columns)
    )
    # new open version for changed keys: tracked cols from the update,
    # untracked attrs carried forward from the old open row
    def new_val(c: str):
        return F.col(f"__u_{c}") if c in tracked else F.col(c)

    opened = (
        j.where(has_open & has_upd & ~same)
        .select(
            F.col(key),
            *[new_val(c).alias(c) for c in attrs],
            F.lit(change_ts_us).cast("long").alias("valid_from_us"),
            F.lit(None).cast("long").alias("valid_to_us"),
            F.lit(True).alias("is_current"),
        )
        .select(*snapshot.columns)
    )
    # brand-new keys: insert open; untracked attrs are null
    inserted = (
        j.where(~has_open)
        .select(
            F.col("__k").alias(key),
            *[
                (F.col(f"__u_{c}") if c in tracked else F.lit(None)).alias(c)
                for c in attrs
            ],
            F.lit(change_ts_us).cast("long").alias("valid_from_us"),
            F.lit(None).cast("long").alias("valid_to_us"),
            F.lit(True).alias("is_current"),
        )
        .select(*snapshot.columns)
    )
    return closed.unionByName(kept).unionByName(closed_now).unionByName(opened).unionByName(inserted)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """CDC-style reconciliation of two table snapshots: one row per key
    whose state differs, labeled ``added`` (key only in ``new``),
    ``removed`` (only in ``old``) or ``changed`` (present in both, any
    ``compare_cols`` value differing null-safely). Unchanged keys are
    dropped — the output IS the change feed a downstream incremental
    consumer would apply.

    Output: key_cols, change_type, then ``old_<c>`` / ``new_<c>`` for every
    compare column (nulls on the absent side for added/removed).

    Scale shape: both sides are PRUNED to key + compare columns before the
    single full-outer sort-merge join — the one unavoidable shuffle per
    side, on the key both snapshots are naturally bucketed by on a real
    lake (bucketed layouts from sources/bucketing.py make it zero-exchange).
    Comparison is column-wise ``<=>`` (null-safe), no row serialization.
    """
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in key_cols],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in key_cols],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    cond = None
    for k in key_cols:
        eq = F.col(f"__ko_{k}") == F.col(f"__kn_{k}")
        cond = eq if cond is None else cond & eq
    joined = o.join(n, cond, "full_outer")

    differs = None
    for c in compare_cols:
        d = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        differs = d if differs is None else differs | d

    change_type = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
    )
    out_keys = [
        F.coalesce(F.col(f"__ko_{k}"), F.col(f"__kn_{k}")).alias(k) for k in key_cols
    ]
    val_cols = [c for pair in zip(
        [f"old_{c}" for c in compare_cols], [f"new_{c}" for c in compare_cols]
    ) for c in pair]
    return (
        joined.withColumn("change_type", change_type)
        .where(F.col("change_type").isNotNull())
        .select(*out_keys, "change_type", *val_cols)
    )


def scd2_asof(dim: DataFrame, ts_us: int) -> DataFrame:
    """Point-in-time (AS OF) read of an SCD2 dimension: the rows whose
    validity interval covers ``ts_us`` under the half-open [from, to)
    convention ``scd2_merge`` writes — ``valid_from_us <= ts`` and
    (open or ``valid_to_us > ts``). Exactly one row per key that existed
    at ``ts``; a key inserted at ``ts`` is visible, a key whose version
    closed at ``ts`` shows its successor.

    At scale this is a pure scan-side filter — both bounds are
    min/max-prunable parquet predicates, so time travel over a
    partitioned SCD2 dimension reads only the row groups whose validity
    range can cover ``ts``. No shuffle, no join."""
    return dim.where(
        (F.col("valid_from_us") <= F.lit(ts_us))
        & (F.col("valid_to_us").isNull() | (F.col("valid_to_us") > F.lit(ts_us)))
    )


def cdc_apply(
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a change-data-capture log to materialize the CURRENT table
    state: for every key, the change with the highest sequence wins; a
    winning delete removes the key entirely (Debezium/Delta-CDF apply
    semantics).

    Implemented as ONE grouped aggregate — ``max_by(struct(*), struct(seq))``
    — not a row_number window: the aggregate gets map-side partial
    combining (each task pre-reduces its keys to one candidate row before
    the shuffle), so a hot key that received millions of updates ships ONE
    row per task instead of funnelling its whole history through a single
    window partition. That asymmetry is the difference between "works" and
    "works on the key that every bot hammered" at 100 TB.

    ``seq_cols`` must totally order each key's changes (e.g. (ts, log
    offset)); ties are undefined exactly as in any CDC consumer.
    """
    if not key_cols or not seq_cols:
        raise ValueError("key_cols and seq_cols must be non-empty")
    row = F.struct(*[F.col(c) for c in changes.columns])
    seq = F.struct(*[F.col(c) for c in seq_cols])
    latest = changes.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.max_by(row, seq).alias("__last")
    )
    survivors = latest.where(F.col(f"__last.{op_col}") != delete_op)
    return survivors.select(
        *[F.col(f"__last.{c}").alias(c) for c in changes.columns]
    )
