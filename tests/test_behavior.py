"""Behavioral analytics: cascade-funnel semantics on crafted event logs
(ordering, strict-after ties, partial cascades), retention-matrix
invariants, and the plan gates that keep both one-shuffle-shaped."""

from __future__ import annotations

import datetime as dt

import pytest

import __spark_entry__ as entrymod
from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators import (
    behavior as B,
)
from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.plans import (
    inspect as PI,
)
from tests.conftest import SF_DIR


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_type string")


STEPS = ("view", "click", "purchase")


def test_funnel_cascade_semantics(spark):
    rows = [
        # user 1: full in-order cascade; earliest qualifying event wins
        (1, _ts(1), "view"),
        (1, _ts(2), "view"),  # later view ignored (t1 = min)
        (1, _ts(3), "click"),
        (1, _ts(5), "purchase"),
        # user 2: purchase BEFORE click → cascade stops at step 2
        (2, _ts(1), "view"),
        (2, _ts(2), "purchase"),
        (2, _ts(3), "click"),
        # user 3: click tied with view (same ts) → strict-after excludes it
        (3, _ts(1), "view"),
        (3, _ts(1), "click"),
        # user 4: step-1 only
        (4, _ts(9), "view"),
        # user 5: never starts (click without view)
        (5, _ts(1), "click"),
    ]
    out = {
        r["user_id"]: r
        for r in B.funnel(_events(spark, rows), STEPS).collect()
    }
    assert out[1]["step1_ts"] == _ts(1)
    assert out[1]["step2_ts"] == _ts(3)
    assert out[1]["step3_ts"] == _ts(5)
    assert out[1]["steps_completed"] == 3
    assert out[2]["steps_completed"] == 2
    assert out[2]["step3_ts"] is None
    assert out[3]["steps_completed"] == 1
    assert out[4]["steps_completed"] == 1
    assert out[5]["steps_completed"] == 0
    assert out[5]["step1_ts"] is None


def test_funnel_late_restart_not_used(spark):
    # cascade is EARLIEST-anchored: a second view after the click does NOT
    # re-anchor; click strictly before the first view never counts
    rows = [
        (1, _ts(5), "view"),
        (1, _ts(3), "click"),  # before the view → dropped
        (1, _ts(8), "view"),
    ]
    (r,) = B.funnel(_events(spark, rows), STEPS).collect()
    assert r["step1_ts"] == _ts(5)
    assert r["steps_completed"] == 1


def test_funnel_counts_table(spark):
    rows = [
        (1, _ts(1), "view"),
        (1, _ts(2), "click"),
        (1, _ts(3), "purchase"),
        (2, _ts(1), "view"),
        (2, _ts(2), "click"),
        (3, _ts(1), "view"),
        (4, _ts(1), "purchase"),  # 0 steps (no view)
    ]
    per_user = B.funnel(_events(spark, rows), STEPS)
    table = {r["step"]: r for r in B.funnel_counts(per_user, 3).collect()}
    assert [table[i]["n_users"] for i in (1, 2, 3)] == [3, 2, 1]
    assert table[1]["conversion_from_prev"] == 1.0
    assert table[2]["conversion_from_prev"] == pytest.approx(2 / 3, abs=1e-9)
    assert table[3]["conversion_from_prev"] == pytest.approx(1 / 2, abs=1e-9)


def test_funnel_empty_steps_rejected(spark):
    with pytest.raises(ValueError):
        B.funnel(_events(spark, []), ())


def test_retention_matrix_invariants(spark):
    day = lambda d, h=0: dt.datetime(2024, 1, d, h)  # noqa: E731
    rows = [
        # cohort Jan 1: users 1,2 — user 1 returns day+1 and day+3
        (1, day(1), "view"),
        (1, day(2), "view"),
        (1, day(4, 5), "click"),
        (2, day(1, 8), "view"),
        # cohort Jan 2: user 3, returns day+1 (two events same day → 1 active)
        (3, day(2), "view"),
        (3, day(3, 1), "view"),
        (3, day(3, 2), "click"),
    ]
    out = {
        (r["cohort_date"], r["day_offset"]): r
        for r in B.cohort_retention(_events(spark, rows)).collect()
    }
    c1, c2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
    assert out[(c1, 0)]["n_active"] == 2 and out[(c1, 0)]["cohort_size"] == 2
    assert out[(c1, 1)]["n_active"] == 1
    assert out[(c1, 3)]["n_active"] == 1
    assert out[(c2, 1)]["n_active"] == 1
    assert (c2, 2) not in out
    for r in out.values():
        assert r["n_active"] <= r["cohort_size"]
        assert r["retention_frac"] == pytest.approx(
            r["n_active"] / r["cohort_size"], abs=1e-9
        )
    assert out[(c1, 0)]["retention_frac"] == 1.0


def test_funnel_single_shuffle_and_pushdown(spark):
    qs = entrymod.queries()
    df = qs["events_funnel"](spark, SF_DIR)
    # one groupBy(user) exchange; the step-type filter reaches the scan
    PI.assert_max_exchanges(df, 1)
    PI.assert_filter_pushed(df, "event_type")
    assert not PI.has_cartesian(df)


def test_retention_bounded_shuffles(spark):
    qs = entrymod.queries()
    df = qs["events_cohort_retention"](spark, SF_DIR)
    # window-by-user + distinct/agg + tiny cohort-size window
    PI.assert_max_exchanges(df, 3)
    assert not PI.has_cartesian(df)


def test_transition_matrix_semantics(spark):
    qs = entrymod.queries()
    import datetime as _dt

    # crafted check via the operator path on a tiny df, including a ts tie
    # broken by event_id
    rows = [
        (1, 10, _ts(1), "a"),
        (1, 11, _ts(2), "b"),
        (1, 12, _ts(2), "c"),  # tie with event 11 → ordered by event_id: b→c
        (1, 13, _ts(3), "a"),
        (2, 20, _ts(1), "a"),
        (2, 21, _ts(2), "b"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, event_type string"
    )
    df.createOrReplaceTempView("__trans_events")
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in (
            df.withColumn("next_type", F.lead("event_type").over(w))
            .where(F.col("next_type").isNotNull())
            .groupBy(
                F.col("event_type").alias("from_type"),
                F.col("next_type").alias("to_type"),
            )
            .count()
            .withColumnRenamed("count", "n_transitions")
        ).collect()
    }
    assert pairs == {("a", "b"): 2, ("b", "c"): 1, ("c", "a"): 1}

    # registry query: probabilities row-normalize to 1 per from_type
    out = qs["events_transition_matrix"](spark, SF_DIR)
    import collections

    sums = collections.defaultdict(float)
    for r in out.collect():
        sums[r["from_type"]] += r["p_transition"]
    assert all(abs(s - 1.0) < 1e-6 for s in sums.values()), dict(sums)
    assert not PI.has_cartesian(out)


def test_copurchase_hot_basket_cap_and_cosine(spark):
    """A basket above the cap is dropped BEFORE pair generation (its items
    emit no pairs and don't count toward item sizes); cosine matches the
    hand formula on a crafted corpus."""
    import math

    from pyspark.sql import functions as F  # noqa: F401
    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators.behavior import (
        copurchase_similarity,
    )

    rows = []
    # 6 normal customers all buy {1, 2}; 3 of them also buy 3
    for c in range(6):
        rows += [(c, 1), (c, 2)]
    for c in range(3):
        rows.append((c, 3))
    # one bot basket with 10 items incl. 1 and 2 — must be dropped at cap 8
    rows += [(99, i) for i in range(1, 11)]
    baskets = spark.createDataFrame(rows, "cust int, part int")
    out = {
        (r["part_a"], r["part_b"]): r
        for r in copurchase_similarity(
            baskets, min_support=2, max_basket=8
        ).collect()
    }
    r12 = out[(1, 2)]
    assert r12["n_ab"] == 6 and r12["n_a"] == 6 and r12["n_b"] == 6  # bot excluded
    assert abs(r12["cosine"] - 1.0) < 1e-9
    r13 = out[(1, 3)]
    assert r13["n_ab"] == 3
    assert abs(r13["cosine"] - round(3 / math.sqrt(6 * 3), 9)) < 1e-12
    # no pair involving a bot-only item survives
    assert not any(a > 3 or b > 3 for a, b in out)
