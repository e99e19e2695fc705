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
