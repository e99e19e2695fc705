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


# ---------------------------------------------------------------------------
# Z-order layout
# ---------------------------------------------------------------------------


def test_zorder_code_known_values(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, 0), (3, 0), (0, 3), (65535, 65535), (1, 2)], "x long, y long"
    )
    out = [
        r["z"]
        for r in df.select(bucketing.zorder_code(F.col("x"), F.col("y")).alias("z"))
        .orderBy("x", "y")
        .collect()
    ]
    # (0,0)->0; (0,3)->0b1010; (1,2)->0b1001; (3,0)->0b0101; (65535,65535)->2^32-1
    assert out == [0, 10, 9, 5, 2**32 - 1]


def test_zorder_code_int32_inputs_nonnegative(spark):
    """IntegerType inputs must produce the same codes as LONG: without the
    internal long-cast the spread reaches the int32 sign bit and codes go
    negative, disagreeing with the all-BIGINT DuckDB mirror."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(65535, 65535), (32768, 0), (0, 32768), (40000, 50000)], "x int, y int"
    )
    got = [
        r["z"]
        for r in df.select(bucketing.zorder_code(F.col("x"), F.col("y")).alias("z"))
        .orderBy("x", "y")
        .collect()
    ]
    import duckdb

    exp = [
        r[0]
        for r in duckdb.sql(
            "SELECT "
            + bucketing.zorder_code_sql("CAST(x AS BIGINT)", "CAST(y AS BIGINT)")
            + " FROM (VALUES (0, 32768), (32768, 0), (40000, 50000),"
            " (65535, 65535)) AS t(x, y)"
        ).fetchall()
    ]
    assert got == exp
    assert all(z >= 0 for z in got)


@pytest.mark.slow
def test_zorder_layout_bounds_both_dimensions(spark, tmp_path):
    """The point of the Morton curve: every output file covers a tight
    bounding box in BOTH dimensions, so min/max stats prune on either
    column. A plain x-sort bounds only x — its files span ~the full y
    range."""
    import glob

    from pyspark.sql import functions as F

    n, dom = 40_000, 4096
    df = spark.range(n).select(
        ((F.col("id") * 2654435761) % dom).alias("x"),
        ((F.col("id") * 40503 + 7919) % dom).alias("y"),
    )
    zpath = str(tmp_path / "zord")
    spath = str(tmp_path / "xsort")
    bucketing.write_zordered(df, zpath, "x", "y", num_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(spath)
    )

    def max_y_span(path):
        spans = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            row = (
                spark.read.parquet(f)
                .agg((F.max("y") - F.min("y")).alias("s"))
                .collect()[0]
            )
            spans.append(row["s"])
        return max(spans), len(spans)

    zy, zn = max_y_span(zpath)
    sy, sn = max_y_span(spath)
    assert zn >= 8 and sn >= 8  # both layouts actually split into files
    # x-sorted files are blind to y: they span nearly the whole y domain
    assert sy > dom * 0.9, sy
    # 16 files = 4 bits of curve prefix = a 4x4 quadrant grid; a file whose
    # range-boundary straddles two quadrants spans at most 2 of the 4 y
    # quadrants -> every z-ordered file bounds y to <= dom/2 (vs ~dom for
    # the x-sort); more files tighten the box quadratically
    assert zy <= dom * 0.55, zy
