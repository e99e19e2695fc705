"""Robust outlier detection: median/MAD semantics on crafted groups —
known z-scores, MAD-zero guard, broadcast-stats plan gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators import (
    anomaly as A,
)
from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.plans import (
    inspect as PI,
)
from tests.conftest import SF_DIR


def test_known_median_and_mad(spark):
    # group g: values 1..9 plus a wild 100 → med 5.5? no: 10 values
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 100.0]
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, v double")
    (stats,) = A.robust_group_stats(df, ["grp"], "v").collect()
    assert stats["med"] == pytest.approx(5.5)
    # deviations: 4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,94.5 → median 2.5
    assert stats["mad"] == pytest.approx(2.5)
    out = A.robust_outliers(df, ["grp"], "v", k=3.5).collect()
    assert [r["v"] for r in out] == [100.0]
    (r,) = out
    assert r["robust_z"] == pytest.approx(0.6745 * (100.0 - 5.5) / 2.5, abs=1e-6)


def test_mad_zero_group_yields_no_outliers(spark):
    # >half identical values → MAD 0 → z null, nothing flagged (no div-by-0)
    df = spark.createDataFrame(
        [("g", 1.0)] * 6 + [("g", 50.0), ("g", -50.0)], "grp string, v double"
    )
    assert A.robust_outliers(df, ["grp"], "v").count() == 0


def test_groups_independent(spark):
    rows = [("a", v) for v in [0.0, 1.0, 2.0, 1000.0]] + [
        ("b", v) for v in [990.0, 1000.0, 1010.0, 1020.0]
    ]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = {(r["grp"], r["v"]) for r in A.robust_outliers(df, ["grp"], "v").collect()}
    # 1000 is wild in group a but normal in group b
    assert ("a", 1000.0) in out
    assert not any(g == "b" for g, _ in out)


def test_outlier_query_plan_broadcasts_stats(spark):
    qs = entrymod.queries()
    df = qs["events_outlier_robust"](spark, SF_DIR)
    assert PI.has_broadcast_join(df)
    assert not PI.has_cartesian(df)


def test_approx_tier_exact_on_odd_group(spark):
    """With group size far below the sketch accuracy and an odd count, the
    approx median hits the true order statistic — identical flagged set."""
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 200.0]
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, v double")
    exact = {r["v"] for r in A.robust_outliers(df, ["grp"], "v").collect()}
    approx = {
        r["v"] for r in A.robust_outliers(df, ["grp"], "v", approx=True).collect()
    }
    assert exact == approx == {200.0}


def test_approx_tier_band_bound_on_events(spark):
    """On the real events table the approx tier may disagree with exact
    ONLY for rows whose exact |z| sits in a narrow band around k: the
    sketch returns an order statistic instead of the interpolated median,
    shifting med/MAD by at most one inter-value gap. Pin: every
    symmetric-difference row has exact |z| within ±band of k; agreement is
    implied for everything outside the band."""
    import pyspark.sql.functions as F
    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.sources.tables import (
        load_table,
    )

    k, band = 3.5, 0.25
    ev = load_table(spark, SF_DIR, "events").select("event_id", "event_type", "value")
    exact_ids = {
        r["event_id"] for r in A.robust_outliers(ev, ["event_type"], "value", k=k).collect()
    }
    approx_ids = {
        r["event_id"]
        for r in A.robust_outliers(ev, ["event_type"], "value", k=k, approx=True).collect()
    }
    # exact z for EVERY row (not just outliers), from the exact stats
    stats = A.robust_group_stats(ev, ["event_type"], "value")
    z_all = {
        r["event_id"]: r["z"]
        for r in ev.join(F.broadcast(stats), ["event_type"])
        .select(
            "event_id",
            (
                F.lit(A.MAD_Z)
                * (F.col("value") - F.col("med"))
                / F.nullif(F.col("mad"), F.lit(0.0))
            ).alias("z"),
        )
        .collect()
    }
    sym = exact_ids ^ approx_ids
    assert all(
        z_all[i] is not None and k - band <= abs(z_all[i]) <= k + band for i in sym
    ), f"{len(sym)} divergent rows outside the ±{band} band"
    # and the tiers genuinely agree on the overwhelming majority
    assert len(sym) <= max(3, len(exact_ids) // 20)
