"""Bucketed co-located join tests: the join of two same-bucketed tables must
plan with zero shuffle exchanges and zero sorts, and return the same rows as
the plain join."""

from __future__ import annotations

import pytest

from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.plans import (
    inspect as PI,
)
from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.sources import (
    bucketing,
    tables,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed(spark):
    # spark.sql.warehouse.dir is a static conf — tables land in the default
    # ./spark-warehouse (gitignored) and are dropped after the module
    li = tables.load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = tables.load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    bucketing.write_bucketed(li, "li_b", ["l_orderkey"], n_buckets=8)
    bucketing.write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"), "ord_b", ["l_orderkey"], n_buckets=8
    )
    yield "li_b", "ord_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def test_bucketed_join_is_exchange_free(spark, bucketed):
    left, right = bucketed
    # disable broadcast so the test exercises the sort-merge path bucketing
    # is designed for (at real scale neither side broadcasts anyway)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # Spark 3+ ignores per-bucket sort order unless this is on (SPARK-28595);
    # with one file per bucket (write_bucketed guarantees it) the scan then
    # reports its ordering and the merge join needs no Sort either
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        joined = bucketing.bucketed_join(spark, left, right, ["l_orderkey"])
        plan = PI.formatted_plan(joined)
        assert "SortMergeJoin" in plan, plan
        PI.assert_max_exchanges(joined, 0)
        # bucket files are written pre-sorted by the key: no Sort nodes either
        import re

        assert not re.search(r"^\(\d+\) Sort\b", plan, flags=re.M), plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")


def test_bucketed_join_matches_plain_join(spark, bucketed):
    left, right = bucketed
    li = tables.load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = tables.load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    plain = li.join(orders, ["l_orderkey"]).select("l_orderkey", "l_extendedprice", "o_totalprice")
    buck = bucketing.bucketed_join(spark, left, right, ["l_orderkey"]).select(
        "l_orderkey", "l_extendedprice", "o_totalprice"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, buck.collect()))
