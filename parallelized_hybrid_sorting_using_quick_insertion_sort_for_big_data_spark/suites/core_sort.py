"""Fidelity-layer queries: the reference's sort capability, oracle-checked.

Mirrors /root/reference capabilities (SURVEY.md §2a): total ascending sort,
top-k, seeded generator inputs, ranked ordered output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import hybrid, sorting
from ..sources import datagen
from ..sources.tables import load_table
from ..queries import query

# ---------------------------------------------------------------------------
# 1. Total sort of a table column (the flagship; SURVEY.md §7.1)
# ---------------------------------------------------------------------------

_SORT_ORACLE = """
SELECT
  row_number() OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rnk,
  l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
"""


@query("sort_total_lineitem", sql=_SORT_ORACLE)
def sort_total_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ascending sort of lineitem by extended price with materialized
    rank — the reference's core capability (total sort,
    QuickInsertionHeap.c:205-215) on a real table column. Rank is computed
    distributed (no single-partition window): see sorting.ranked."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    out = sorting.ranked(
        li, ["l_extendedprice", "l_orderkey", "l_linenumber"], rank_col="rnk"
    )
    return out.select("rnk", "l_orderkey", "l_linenumber", "l_extendedprice")


# ---------------------------------------------------------------------------
# 2. Top-k (k-way merge with early stop → TakeOrderedAndProject)
# ---------------------------------------------------------------------------

_TOPK_ORACLE = """
SELECT
  row_number() OVER (ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rnk,
  l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 100
"""


@query("sort_topk_lineitem", sql=_TOPK_ORACLE)
def sort_topk_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 lineitems by extended price. Plans to TakeOrderedAndProject:
    per-partition size-k heaps, driver merges P*k rows — the scalable form of
    the reference's k-way merge (QuickInsertionHeap.c:87-136) when only a
    prefix is needed."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    keys = ["l_extendedprice", "l_orderkey", "l_linenumber"]
    top = sorting.top_k(li, keys, k=100, ascending=[False, True, True])
    out = sorting.ranked_small(top, keys, ascending=[False, True, True], rank_col="rnk")
    return out.select("rnk", "l_orderkey", "l_linenumber", "l_extendedprice")


# ---------------------------------------------------------------------------
# 3. Seeded generator → total sort (the reference's exact experiment shape)
# ---------------------------------------------------------------------------

_GEN_N = 100_000

_GEN_SORT_ORACLE = f"""
SELECT
  row_number() OVER (ORDER BY value, id) AS rnk,
  id, value
FROM ({datagen.seeded_ints_sql(_GEN_N, modulus=datagen.DIST_B_MOD, seed=42)})
"""


@query("sort_seeded_ints", sql=_GEN_SORT_ORACLE)
def sort_seeded_ints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort 100k deterministic pseudo-random ints in [0, 1e6) — the
    reference's seed-42 modulus-1e6 experiment (quickThreshold.c:147,167)
    with an engine-portable generator (datagen.mixed_value), so the DuckDB
    oracle reproduces the identical input without sharing state."""
    ints = datagen.seeded_ints(spark, _GEN_N, modulus=datagen.DIST_B_MOD, seed=42)
    out = sorting.ranked(ints, ["value", "id"], rank_col="rnk")
    return out.select("rnk", "id", "value")


# ---------------------------------------------------------------------------
# 3b. Hybrid quick+insertion-sort demo (reference kernel, distributed)
# ---------------------------------------------------------------------------

_HYBRID_N = 50_000

_HYBRID_ORACLE = f"""
SELECT
  row_number() OVER (ORDER BY value) AS rnk,
  value
FROM ({datagen.seeded_ints_sql(_HYBRID_N, modulus=datagen.DIST_B_MOD, seed=42)})
"""


@query("sort_hybrid_quickinsertion", sql=_HYBRID_ORACLE)
def sort_hybrid_quickinsertion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's own algorithm end-to-end: range scatter →
    per-partition hybrid quicksort+insertion sort (threshold 25,
    QuickInsertionHeap.c:41-51) → ordered reassembly with global rank.
    Ties make (rnk, value) deterministic as a multiset, so the DuckDB
    row_number oracle matches exactly."""
    ints = datagen.seeded_ints(spark, _HYBRID_N, modulus=datagen.DIST_B_MOD, seed=42)
    return hybrid.hybrid_ranked(ints, "value", threshold=hybrid.DEFAULT_THRESHOLD)


# ---------------------------------------------------------------------------
# 4. Multi-key sort with nulls + desc (idiomatic generalization, SURVEY §2a)
# ---------------------------------------------------------------------------

_MULTIKEY_ORACLE = """
SELECT
  row_number() OVER (
    ORDER BY o_orderstatus DESC, o_totalprice ASC, o_orderkey ASC) AS rnk,
  o_orderkey, o_orderstatus, o_totalprice
FROM orders
"""


@query("sort_multikey_orders", sql=_MULTIKEY_ORACLE)
def sort_multikey_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key mixed-direction sort (status desc, price asc) — the natural
    generalization of the reference's single-int-column sort once real
    schemas exist (SURVEY.md §2a 'derived capability')."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    out = sorting.ranked(
        orders,
        ["o_orderstatus", "o_totalprice", "o_orderkey"],
        ascending=[False, True, True],
        rank_col="rnk",
    )
    return out.select("rnk", "o_orderkey", "o_orderstatus", "o_totalprice")


# ---------------------------------------------------------------------------
# 5. Per-partition sort (shuffle-free). Promoted from rows-only to a full
#    value oracle (VERDICT r06 #7): partition IDs stay engine-side, but the
#    ORDER the local sort produced is made SQL-visible by enumerating each
#    partition's physical rows and re-basing the index per orderkey.
# ---------------------------------------------------------------------------

_SORT_WITHIN_ORACLE = """
SELECT l_orderkey, l_linenumber, l_shipdate,
       CAST(row_number() OVER (
         PARTITION BY l_orderkey ORDER BY l_shipdate, l_linenumber) - 1
       AS BIGINT) AS lrk
FROM lineitem
"""


@query("sort_within_partitions", sql=_SORT_WITHIN_ORACLE)
def sort_within_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's per-rank local-sort stage in isolation
    (QuickInsertionHeap.c:208): hash-distribute lineitem on l_orderkey,
    then sort each partition by (orderkey, shipdate, linenumber) with zero
    global shuffle of the sorted output.

    Oracle construction: a mapInPandas pass enumerates each partition's
    rows IN THEIR PHYSICAL ORDER (narrow, order-preserving), and the
    per-orderkey local rank is that enumeration re-based by the group's
    minimum (one window). Because hash distribution puts every row of an
    orderkey in one partition and the local sort makes the group
    contiguous and inner-ordered, the emitted ``lrk`` equals
    ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_shipdate,
    l_linenumber) - 1 IFF the partition-local sort actually sorted — a
    full value-hash oracle on the operator's output order, with partition
    ids never leaving the engine. (l_orderkey, l_linenumber) is the
    lineitem PK, so the rank is deterministic on both engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    arranged = sorting.partition_sort(
        li.repartition(8, "l_orderkey"),
        ["l_orderkey", "l_shipdate", "l_linenumber"],
    )

    def enumerate_rows(batches):
        i = 0
        for pdf in batches:
            pdf = pdf.assign(__idx=range(i, i + len(pdf)))
            i += len(pdf)
            yield pdf

    enumerated = arranged.mapInPandas(
        enumerate_rows,
        "l_orderkey bigint, l_linenumber int, l_shipdate timestamp_ntz, __idx bigint",
    )
    w = Window.partitionBy("l_orderkey")
    return enumerated.select(
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        (F.col("__idx") - F.min("__idx").over(w)).alias("lrk"),
    )
