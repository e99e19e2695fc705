"""Hybrid quick+insertion kernel tests — semantic parity with the reference
algorithm (SURVEY.md §5.2: threshold invariance, permutation, parity with
native orderBy, adversarial shapes)."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators import (
    hybrid,
    sorting,
)
from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.sources import (
    datagen,
)


@given(st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_kernel_matches_sorted(xs):
    assert hybrid.hybrid_quickinsertion_sort(list(xs)) == sorted(xs)


@pytest.mark.parametrize("threshold", [1, 2, 25, 1000])
def test_threshold_invariance(threshold):
    """Mirrors the quickThreshold.c experiment: output identical for any
    threshold (quickThreshold.c:187-194)."""
    rng = random.Random(42)
    xs = [rng.randrange(1_000_000) for _ in range(5_000)]
    assert hybrid.hybrid_quickinsertion_sort(list(xs), threshold) == sorted(xs)


@pytest.mark.slow
def test_kernel_adversarial_shapes():
    """Lomuto last-pivot worst cases: pre-sorted, reversed, all-equal —
    the explicit stack must not blow up (cf. QuickInsertionHeap.cu:40-72)."""
    n = 20_000
    for xs in ([*range(n)], [*range(n, 0, -1)], [7] * n, []):
        assert hybrid.hybrid_quickinsertion_sort(list(xs)) == sorted(xs)


def test_kway_merge():
    runs = [[1, 4, 9], [2, 2, 5], [], [0, 100]]
    assert list(hybrid.k_way_merge(runs)) == sorted(sum(runs, []))


def test_hybrid_ranked_matches_native(spark):
    """Distributed hybrid pipeline ≡ native orderBy (the production path)."""
    ints = datagen.seeded_ints(spark, 20_000, num_partitions=8)
    demo = hybrid.hybrid_ranked(ints, "value", num_partitions=8).orderBy("rnk")
    native = sorting.total_sort(ints.select("value"), ["value"])
    assert [r["value"] for r in demo.collect()] == [r["value"] for r in native.collect()]
    assert [r["rnk"] for r in demo.orderBy("rnk").collect()] == list(range(1, 20_001))


def test_scatter_sort_merge_collect_matches(spark):
    """The reference's full rank-0-merge topology (tiny-scale demo) computes
    the same result as the distributed path."""
    ints = datagen.seeded_ints(spark, 3_000, num_partitions=5)
    merged = hybrid.scatter_sort_merge_collect(ints, "value", num_partitions=4)
    expected = sorted(r["value"] for r in ints.collect())
    assert merged == expected
