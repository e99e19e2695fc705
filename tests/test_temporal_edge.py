"""Edge-case pins for the temporal operators and the salted join:

- range_join with NEGATIVE timestamps (pre-epoch) — bucket ids must use
  floor division, not truncate-toward-zero, or near-zero pairs are lost.
- asof_join with a null inside one value column — the carried right row
  must stay atomic (one struct), never a column mix of two right rows.
- asof_join duplicate-right-timestamp tie — deterministic winner.
- salted_join rejects right/full outer (would replicate unmatched
  small-side rows n_salts times).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators import (
    skew,
    temporal,
)


def test_range_join_negative_timestamps(spark):
    # pair at (-500, 500): |delta| = 1000 <= tol — with truncating `div`
    # both land in bucket 0 only by accident; with a wider example the
    # bug drops pairs. Use points straddling zero at several offsets.
    left = spark.createDataFrame(
        [Row(k="a", lt=-2_500), Row(k="a", lt=-500), Row(k="a", lt=500)],
    )
    right = spark.createDataFrame(
        [Row(k="a", rt=-1_600), Row(k="a", rt=400), Row(k="a", rt=-3_400)],
    )
    got = {
        (r["lt"], r["rt"])
        for r in temporal.range_join(
            left, right, ["k"], "lt", "rt", tolerance_us=1_000
        ).collect()
    }
    # brute-force oracle
    want = {
        (lt, rt)
        for lt in (-2_500, -500, 500)
        for rt in (-1_600, 400, -3_400)
        if abs(lt - rt) <= 1_000
    }
    assert got == want and len(want) >= 3


def test_asof_join_null_value_col_stays_atomic(spark):
    # right row at ts=10 has b=null; right row at ts=5 has b=99.
    # A per-column carry would attach (a=from ts10, b=from ts5) — a row
    # that never existed. The struct carry must give (a=1, b=None).
    left = spark.createDataFrame([Row(k="x", ts=20)])
    right = spark.createDataFrame(
        [Row(k="x", rts=5, a=0, b=99), Row(k="x", rts=10, a=1, b=None)],
        schema="k string, rts long, a long, b long",
    )
    out = temporal.asof_join(left, right, ["k"], "ts", "rts", ["a", "b"]).collect()
    assert len(out) == 1
    assert out[0]["prev_a"] == 1 and out[0]["prev_b"] is None


def test_asof_join_duplicate_right_ts_deterministic(spark):
    left = spark.createDataFrame([Row(k="x", ts=10)])
    right = spark.createDataFrame(
        [Row(k="x", rts=10, a=1), Row(k="x", rts=10, a=2)],
    )
    runs = {
        temporal.asof_join(left, right, ["k"], "ts", "rts", ["a"]).collect()[0][
            "prev_a"
        ]
        for _ in range(3)
    }
    # deterministic winner: the struct-maximum right row
    assert runs == {2}


def test_salted_join_rejects_outer_modes(spark):
    big = spark.range(10).select(F.col("id").alias("k"))
    small = spark.range(3).select(F.col("id").alias("dk"))
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError):
            skew.salted_join(big, small, "k", "dk", how=how)


def test_salted_join_equal_key_names_unambiguous(spark):
    big = spark.range(100).select((F.col("id") % 5).alias("k"), F.col("id").alias("v"))
    small = spark.range(5).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    out = skew.salted_join(big, small, "k", "k", n_salts=4)
    # exactly one `k` column survives and is selectable without ambiguity
    assert out.columns.count("k") == 1
    assert out.count() == 100
    assert out.where(F.col("w") == F.col("k") * 10).count() == 100


def test_asof_join_with_map_value_col(spark):
    """A map-typed value column (unorderable: cannot appear in ORDER BY)
    must still carry atomically through the as-of join."""
    left = spark.createDataFrame(
        [Row(k=1, lts=100), Row(k=1, lts=50)], "k int, lts long"
    )
    right = spark.createDataFrame(
        [Row(k=1, rts=60, props={"a": "1"}), Row(k=1, rts=10, props={"b": "2"})],
        "k int, rts long, props map<string,string>",
    )
    out = temporal.asof_join(
        left, right, by=["k"], left_ts="lts", right_ts="rts", value_cols=["props"]
    )
    got = {r["lts"]: r["prev_props"] for r in out.collect()}
    assert got[100] == {"a": "1"}  # latest right at ts<=100 is rts=60
    assert got[50] == {"b": "2"}  # latest right at ts<=50 is rts=10


# ---------------------------------------------------------------------------
# resample_gapfill
# ---------------------------------------------------------------------------


def test_resample_gapfill_semantics(spark):
    from pyspark.sql import functions as F

    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators.temporal import (
        resample_gapfill,
    )

    us = 1_000_000  # 1s buckets
    rows = [
        ("a", 0, 10.0), ("a", 500_000, 20.0),  # bucket 0: avg 15
        ("a", 3_200_000, 7.0),                 # bucket 3; buckets 1,2 are gaps
        ("b", 5_000_000, 1.0),                 # single-bucket key: no gaps
    ]
    df = spark.createDataFrame(rows, "k string, t long, value double").select(
        "k", F.timestamp_micros(F.col("t")).alias("ts"), "value"
    )
    out = resample_gapfill(df, by=["k"], ts_col="ts", value_col="value", bucket_us=us)
    got = {
        (r["k"], r["bucket_start"].second + r["bucket_start"].minute * 60): r
        for r in out.collect()
    }
    assert len(got) == 5  # a: buckets 0..3 dense; b: bucket 5
    assert got[("a", 0)]["avg_value"] == 15.0 and not got[("a", 0)]["is_gap"]
    assert got[("a", 0)]["n_events"] == 2
    # gap cells: no events, null avg, carried filled value
    for sec in (1, 2):
        r = got[("a", sec)]
        assert r["is_gap"] and r["n_events"] == 0 and r["avg_value"] is None
        assert r["filled_value"] == 15.0
    assert got[("a", 3)]["filled_value"] == 7.0
    assert got[("b", 5)]["n_events"] == 1 and not got[("b", 5)]["is_gap"]
