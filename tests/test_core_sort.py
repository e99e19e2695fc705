"""Fidelity-core tests: sortedness, permutation, determinism, oracle parity
(SURVEY.md §5.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators import (
    sorting,
)
from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.sources import (
    datagen,
)
from tests.conftest import SF_DIR, assert_matches_oracle


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert {"rnk", "l_orderkey", "l_linenumber", "l_extendedprice"} == set(df.columns)


@pytest.mark.parametrize(
    "name",
    [
        "sort_total_lineitem",
        "sort_topk_lineitem",
        "sort_seeded_ints",
        "sort_multikey_orders",
        "sort_hybrid_quickinsertion",
    ],
)
def test_oracle_parity(spark, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert_matches_oracle(qs[name](spark, SF_DIR), oracles[name], SF_DIR)


def test_ranked_is_dense_and_sorted(spark):
    ints = datagen.seeded_ints(spark, 10_000, num_partitions=8)
    out = sorting.ranked(ints, ["value", "id"]).orderBy("rnk")
    pdf = out.toPandas()
    assert pdf["rnk"].tolist() == list(range(1, 10_001))
    assert pdf["value"].is_monotonic_increasing


def test_permutation_property(spark):
    """Sorted output is a multiset-permutation of the input."""
    ints = datagen.seeded_ints(spark, 5_000)
    out = sorting.total_sort(ints, ["value", "id"])
    a = ints.groupBy("value").count().orderBy("value").collect()
    b = out.groupBy("value").count().orderBy("value").collect()
    assert a == b


def test_determinism_seed42(spark):
    """Mirrors quickThreshold.c:147 — seeded generation is run-stable."""
    a = datagen.seeded_ints(spark, 2_000, seed=42).collect()
    b = datagen.seeded_ints(spark, 2_000, seed=42).collect()
    assert sorted(a) == sorted(b)
    c = datagen.seeded_ints(spark, 2_000, seed=43).collect()
    assert sorted(a) != sorted(c)


@pytest.mark.parametrize("n,parts", [(0, 4), (1, 4), (3, 8), (1001, 8)])
def test_edge_cardinalities(spark, n, parts):
    """N=0, N=1, N<P, N%P≠0 — the cases the reference's sentinel padding and
    odd-tail merge bug make interesting (quickThreshold.c:159-172,
    QuickInsertionHeap.cu:98-114)."""
    ints = datagen.seeded_ints(spark, n, num_partitions=parts) if n else (
        spark.range(0).select(F.col("id"), F.col("id").alias("value"))
    )
    out = sorting.ranked(ints, ["value", "id"]).orderBy("rnk").collect()
    assert len(out) == n
    assert [r["rnk"] for r in out] == list(range(1, n + 1))
    vals = [r["value"] for r in out]
    assert vals == sorted(vals)


@pytest.mark.slow
def test_duplicates_and_adversarial_orders(spark):
    """Ties-heavy / pre-sorted / reverse-sorted / constant inputs — quicksort
    worst cases for the reference's Lomuto pivot (QuickInsertionHeap.c:23-38);
    must be non-issues here."""
    base = spark.range(10_000)
    cases = {
        "dups": base.select(F.col("id"), (F.col("id") % 10).alias("value")),
        "sorted": base.select(F.col("id"), F.col("id").alias("value")),
        "reversed": base.select(F.col("id"), (F.lit(10_000) - F.col("id")).alias("value")),
        "equal": base.select(F.col("id"), F.lit(7).cast("long").alias("value")),
    }
    for label, df in cases.items():
        out = sorting.ranked(df, ["value", "id"]).orderBy("rnk").toPandas()
        assert out["value"].is_monotonic_increasing, label
        assert out["rnk"].tolist() == list(range(1, 10_001)), label


def test_topk_matches_full_sort(spark):
    ints = datagen.seeded_ints(spark, 20_000)
    top = sorting.top_k(ints, ["value", "id"], k=50, ascending=[False, True]).collect()
    full = sorting.total_sort(ints, ["value", "id"], ascending=[False, True]).limit(50).collect()
    assert top == full


def test_rank_offset_mask_bound_guard():
    """A partition count at or beyond 2^33 must raise (masked ordinal would
    alias and ranks silently repeat), below the bound offsets accumulate."""
    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators.sorting import (
        _LRN_BOUND,
        _rank_offsets,
    )

    assert _rank_offsets([(0, 5), (1, 3), (2, 0)]) == [(0, 0), (1, 5), (2, 8)]
    assert _rank_offsets([(0, _LRN_BOUND - 1)]) == [(0, 0)]
    with pytest.raises(ValueError, match="2\\^33"):
        _rank_offsets([(0, 10), (1, _LRN_BOUND)])
