"""Breadth-suite oracle parity at sf0.001 (driver runs sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR, assert_matches_oracle

REL_QUERIES = [
    "rel_q1_pricing_summary",
    "rel_join_revenue_by_nation",
    "rel_window_top_orders_per_segment",
    "rel_semi_anti_join",
    "rel_set_operations",
    "rel_scalar_functions",
    "rel_rollup_customers",
    "rel_distinct_aggregates",
    "rel_outer_join",
    "rel_sql_q3_shipping_priority",
    "rel_percentiles",
    "rel_histogram",
    "rel_cube_orders",
]


@pytest.mark.parametrize("name", REL_QUERIES)
def test_oracle_parity(spark, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert_matches_oracle(qs[name](spark, SF_DIR), oracles[name], SF_DIR)


def test_new_relational_oracle_parity(spark):
    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR, assert_matches_oracle

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name in ("rel_pivot_priority_by_year", "rel_window_running_totals"):
        assert_matches_oracle(qs[name](spark, SF_DIR), oracles[name], SF_DIR)


def test_approx_distinct_within_rsd(spark):
    """approx_count_distinct at rsd=0.01 must land within a conservative
    5% of the exact distinct counts per group (HLL++ error is ~rsd with
    rare multi-sigma excursions; 5σ bound keeps the test deterministic)."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.sources.tables import (
        load_table,
    )

    qs = entrymod.queries()
    approx = {
        r["o_orderpriority"]: (r["approx_custs"], r["approx_prices"])
        for r in qs["rel_approx_distinct"](spark, SF_DIR).collect()
    }
    exact = {
        r["o_orderpriority"]: (r["nc"], r["np"])
        for r in load_table(spark, SF_DIR, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("nc"),
            F.countDistinct("o_totalprice").alias("np"),
        )
        .collect()
    }
    assert set(approx) == set(exact) and len(exact) >= 3
    for prio, (ac, ap) in approx.items():
        ec, ep = exact[prio]
        assert abs(ac - ec) <= max(2, 0.05 * ec), (prio, ac, ec)
        assert abs(ap - ep) <= max(2, 0.05 * ep), (prio, ap, ep)


def test_approx_quantiles_within_rank_error(spark):
    """percentile_approx at accuracy 10000 must land within 1/10000 rank
    error of the exact quantile (the sketch's contract)."""
    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    from pyspark.sql import functions as F

    qs = entrymod.queries()
    approx = {
        r["l_returnflag"]: r["approx_pcts"]
        for r in qs["rel_approx_quantiles"](spark, SF_DIR).collect()
    }
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    for flag, pcts in approx.items():
        vals = sorted(
            r["l_extendedprice"]
            for r in li.where(F.col("l_returnflag") == flag)
            .select("l_extendedprice")
            .collect()
        )
        n = len(vals)
        for q, got in zip((0.25, 0.5, 0.75), pcts):
            target = q * (n - 1)
            tol = max(2, n // 10000 + 1)
            lo = vals[max(0, int(target) - tol)]
            hi = vals[min(n - 1, int(target) + tol + 1)]
            assert lo <= got <= hi, (flag, q, got, lo, hi)
