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
    "rel_sql_q5_local_supplier",
    "rel_window_range_frame",
    "rel_moment_stats",
    "rel_sql_q10_returned_items",
    "rel_sql_q18_large_volume",
    "rel_sql_q14_promo_revenue",
    "rel_sql_q19_brand_ranges",
    # round-6 adds (ADVICE r06: these had plan gates but no automated
    # parity pytest — regressions would only surface on driver rotation)
    "rel_sql_q2_min_cost_supplier",
    "rel_sql_q4_priority_check",
    "rel_sql_q6_forecast_revenue",
    "rel_sql_q7_volume_shipping",
    "rel_sql_q8_market_share",
    "rel_sql_q9_product_profit",
    "rel_sql_q11_important_stock",
    "rel_sql_q12_ship_classes",
    "rel_sql_q13_customer_distribution",
    "rel_sql_q15_top_supplier",
    "rel_sql_q16_supplier_relationship",
    "rel_sql_q17_small_quantity",
    "rel_sql_q20_part_promotion",
    "rel_sql_q21_waiting_supplier",
    "rel_sql_q22_dormant_balance",
    "rel_equifreq_binning",
    "rel_window_value_functions",
    "text_bigram_fluency",
    "pipeline_scd2_asof",
    "dedup_containment",
    "graph_degree_distribution",
    # r08: the approx-sketch queries promoted from rows-only to full
    # oracles (engine-invariant exacts + guarantee booleans)
    "rel_approx_quantiles",
    "rel_approx_distinct",
    # r08 late adds
    "rel_groupwise_regression",
    "pipeline_cdc_apply",
    "pipeline_fd_profile",
    "rel_benford_digits",
    "rel_chisq_independence",
    "rel_gini_revenue",
    "rel_copurchase_similarity",
    "rel_winsorized_stats",
    "pipeline_k_anonymity",
    "rel_yoy_revenue",
    "rel_rfm_segmentation",
    # r08 third-session adds
    "rel_association_rules",
    "rel_pareto_abc",
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

    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.suites import (
        relational as REL,
    )

    qs = entrymod.queries()
    # the registry query self-checks: its booleans must all hold, and its
    # exact counts must match an independent countDistinct
    rows = qs["rel_approx_distinct"](spark, SF_DIR).collect()
    assert len(rows) >= 3
    assert all(r["custs_within_5rsd"] and r["prices_within_5rsd"] for r in rows)
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
    for r in rows:
        assert (r["exact_custs"], r["exact_prices"]) == exact[r["o_orderpriority"]]
    # and the pure sketch form (the plan-gated scale path) honors the band
    approx = {
        r["o_orderpriority"]: (r["approx_custs"], r["approx_prices"])
        for r in REL.approx_distinct_sketch(spark, SF_DIR).collect()
    }
    assert set(approx) == set(exact)
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
    # the registry query self-checks its sketch against the rank guarantee
    rows = qs["rel_approx_quantiles"](spark, SF_DIR).collect()
    assert len(rows) >= 3 and all(r["within_rank_bound"] for r in rows)
    # independent pin of the raw sketch's contract (value-bracket check)
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    approx = {
        r["l_returnflag"]: tuple(r["ap"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice", [0.25, 0.5, 0.75], 10000
            ).alias("ap")
        )
        .collect()
    }
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


# ---------------------------------------------------------------------------
# SCD2 merge
# ---------------------------------------------------------------------------


def test_scd2_merge_oracle_parity(spark):
    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR, assert_matches_oracle

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert_matches_oracle(
        qs["pipeline_scd2_merge"](spark, SF_DIR), oracles["pipeline_scd2_merge"], SF_DIR
    )


@pytest.mark.slow
def test_scd2_merge_semantics(spark):
    from pyspark.sql import functions as F

    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators.scd import (
        scd2_merge,
    )

    snap = spark.createDataFrame(
        [
            (1, "a", 10.0, 0, None, True),      # will change
            (2, "b", 20.0, 0, None, True),      # no-op update
            (3, "c", 30.0, 0, None, True),      # no update
            (1, "a", 5.0, -100, 0, False),      # closed history
            (4, "d", None, 0, None, True),      # null -> value change
        ],
        "k long, name string, bal double, valid_from_us long, valid_to_us long, is_current boolean",
    )
    upd = spark.createDataFrame(
        [(1, 11.0), (2, 20.0), (4, 44.0), (9, 99.0)], "k long, bal double"
    )
    out = scd2_merge(snap, upd, key="k", tracked=["bal"], change_ts_us=1000)
    rows = {(r["k"], r["valid_from_us"]): r for r in out.collect()}

    # closed history untouched
    assert rows[(1, -100)]["valid_to_us"] == 0 and not rows[(1, -100)]["is_current"]
    # changed key: old row closed at 1000, new open row with new value
    assert rows[(1, 0)]["valid_to_us"] == 1000 and not rows[(1, 0)]["is_current"]
    assert rows[(1, 1000)]["bal"] == 11.0 and rows[(1, 1000)]["is_current"]
    # null -> value counts as a change (null-safe comparison)
    assert rows[(4, 0)]["valid_to_us"] == 1000
    assert rows[(4, 1000)]["bal"] == 44.0
    # no-op and untouched keys: single unchanged open row
    assert rows[(2, 0)]["is_current"] and rows[(2, 0)]["valid_to_us"] is None
    assert rows[(3, 0)]["is_current"]
    # new key inserted open, untracked attr null
    assert rows[(9, 1000)]["is_current"] and rows[(9, 1000)]["name"] is None
    # exactly one open row per key
    opens = out.where("is_current").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in opens)
    # idempotence: re-applying the same batch adds nothing
    again = scd2_merge(out, upd, key="k", tracked=["bal"], change_ts_us=2000)
    assert again.count() == out.count()
    assert again.where("valid_from_us = 2000").count() == 0


def test_range_frame_peers_share_result(spark):
    """Same-date orders of one customer are RANGE-frame peers: both rows
    must report the identical trailing aggregate (the property a ROWS
    frame would violate)."""
    from pyspark.sql import functions as F

    qs = entrymod.queries()
    out = qs["rel_window_range_frame"](spark, SF_DIR)
    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.sources.tables import (
        load_table,
    )

    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    joined = out.join(o, ["o_orderkey", "o_custkey"])
    per_day = joined.groupBy("o_custkey", "o_orderdate").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("trailing_sum").alias("d_sum"),
        F.countDistinct("trailing_n").alias("d_n"),
    )
    bad = per_day.where((F.col("n") > 1) & ((F.col("d_sum") > 1) | (F.col("d_n") > 1)))
    assert bad.count() == 0
    # and peers genuinely exist in the fixture
    assert per_day.where(F.col("n") > 1).count() > 0


def test_moment_stats_match_native_aggregates(spark):
    """The decimal-moment combination must agree with Spark's native
    corr/covar_samp/stddev_samp to float tolerance (the natives fold
    doubles in partition order, so exact equality is NOT expected — that
    instability is the reason the query uses exact moments)."""
    from pyspark.sql import functions as F

    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.sources.tables import (
        load_table,
    )

    qs = entrymod.queries()
    got = {r["l_returnflag"]: r for r in qs["rel_moment_stats"](spark, SF_DIR).collect()}
    li = load_table(spark, SF_DIR, "lineitem")
    native = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.corr("l_quantity", "l_extendedprice").alias("corr"),
            F.covar_samp("l_quantity", "l_extendedprice").alias("cov"),
            F.stddev_samp("l_quantity").alias("sd"),
        )
        .collect()
    }
    assert set(got) == set(native)
    for flag, r in got.items():
        nv = native[flag]
        assert r["corr"] == pytest.approx(nv["corr"], abs=1e-6)
        assert r["covar_samp"] == pytest.approx(nv["cov"], rel=1e-6)
        assert r["stddev_qty"] == pytest.approx(nv["sd"], rel=1e-9)


def test_gini_bounds_and_known_values(spark):
    """Gini formula sanity on crafted revenues: perfect equality -> 0;
    one-customer-takes-all over n customers -> (n-1)/n; cents-exact."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    def gini(values):
        rows = [(i, float(v)) for i, v in enumerate(values)]
        df = spark.createDataFrame(rows, "c_custkey int, rev double").select(
            F.lit("S").alias("segment"),
            "c_custkey",
            F.round(F.col("rev") * 100).cast("bigint").alias("cents"),
        )
        w = Window.partitionBy("segment").orderBy("cents", "c_custkey")
        r = df.withColumn("i", F.row_number().over(w).cast("bigint"))
        agg = r.groupBy("segment").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("cents").cast("decimal(38,0)")).alias("sx"),
            F.sum((F.col("i") * F.col("cents")).cast("decimal(38,0)")).alias("six"),
        ).collect()[0]
        n, sx, six = agg["n"], float(agg["sx"]), float(agg["six"])
        return (2.0 * six - (n + 1.0) * sx) / (n * sx)

    assert abs(gini([10, 10, 10, 10])) < 1e-12
    assert abs(gini([0, 0, 0, 100]) - 0.75) < 1e-12  # (n-1)/n with n=4


def test_chisq_terms_zero_under_exact_independence(spark):
    """A perfectly independent contingency table must produce all-zero
    chi-square terms (expected == observed in every cell)."""
    from pyspark.sql import functions as F

    qs = entrymod.queries()
    # crafted: rows x cols with counts = r_i * c_j / N exactly
    import __spark_entry__ as E  # noqa: F401

    data = []
    for s, r_i in (("A", 2), ("B", 4)):
        for p, c_j in (("x", 3), ("y", 6)):
            data += [(s, p)] * (r_i * c_j)
    df = spark.createDataFrame(data, "o_orderstatus string, o_orderpriority string")
    df = df.withColumn("o_orderkey", F.monotonically_increasing_id())
    df.createOrReplaceTempView("__chisq_orders")
    cells = df.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count(F.lit(1)).alias("n_obs"))
    from pyspark.sql import Window

    n_row = F.sum("n_obs").over(Window.partitionBy("status")).cast("double")
    n_col = F.sum("n_obs").over(Window.partitionBy("priority")).cast("double")
    n_tot = F.sum("n_obs").over(Window.partitionBy()).cast("double")
    expected = n_row * n_col / n_tot
    dev = F.col("n_obs").cast("double") - expected
    out = cells.select((dev * dev / expected).alias("t")).collect()
    assert all(abs(r["t"]) < 1e-12 for r in out)


def test_association_rules_metric_identities(spark):
    """support is symmetric in the pair, confidence is not; lift is
    symmetric (lift(a→b) == lift(b→a) by construction) and equals
    confidence/expected; all metrics in their legal ranges."""
    rows = entrymod.queries()["rel_association_rules"](spark, SF_DIR).collect()
    assert rows
    by_pair = {(r["ante"], r["cons"]): r for r in rows}
    for (a, b), r in by_pair.items():
        assert 0 < r["support"] <= 1
        assert 0 < r["confidence"] <= 1
        assert r["lift"] > 0
        mirror = by_pair.get((b, a))
        if mirror is not None:
            assert mirror["support"] == r["support"]
            assert mirror["n_ab"] == r["n_ab"]
            assert abs(mirror["lift"] - r["lift"]) <= 1e-9


def test_pareto_abc_class_monotone_and_partitioned(spark):
    """cum_share is non-decreasing in rank, classes appear in A->B->C order
    with no interleaving, and the top-ranked part is always class A."""
    rows = entrymod.queries()["rel_pareto_abc"](spark, SF_DIR).collect()
    rows.sort(key=lambda r: r["rnk"])
    assert rows and rows[0]["abc_class"] == "A"
    order = {"A": 0, "B": 1, "C": 2}
    prev_share, prev_cls = 0.0, 0
    for r in rows:
        assert r["cum_share"] >= prev_share - 1e-12
        assert order[r["abc_class"]] >= prev_cls
        prev_share, prev_cls = r["cum_share"], order[r["abc_class"]]
    assert rows[-1]["cum_share"] == 1.0
