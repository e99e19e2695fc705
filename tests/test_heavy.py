"""Heavy hitters: completeness of the bounded-state candidate pass vs the
exact definition under adversarial partitionings, exact counts, edge cases."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators import (
    heavy as HH,
)


def _expected(values: list[str], k: int) -> dict[str, int]:
    n = len(values)
    return {v: c for v, c in Counter(values).items() if c * k > n}


@pytest.mark.parametrize("parts", [1, 3, 13])
def test_matches_exact_definition_any_partitioning(spark, parts):
    # zipf-ish universe: few frequent heads, long random tail
    rng = random.Random(11)
    values = (
        ["alpha"] * 300
        + ["beta"] * 120
        + ["gamma"] * 40
        + [f"tail{rng.randint(0, 2000)}" for _ in range(1500)]
    )
    rng.shuffle(values)
    df = spark.createDataFrame([(v,) for v in values], "token string").repartition(
        parts
    )
    got = {
        r["value"]: r["n_occurrences"]
        for r in HH.heavy_hitters(df, "token", k=10).collect()
    }
    assert got == _expected(values, 10)


def test_support_fraction_and_threshold_strictness(spark):
    # 4 values × 25 each: with k=4 threshold is n/4 = 25, strict > ⇒ nobody
    values = ["a"] * 25 + ["b"] * 25 + ["c"] * 25 + ["d"] * 25
    df = spark.createDataFrame([(v,) for v in values], "token string")
    assert HH.heavy_hitters(df, "token", k=4).count() == 0
    # k=5 ⇒ threshold 20 ⇒ all four, support 0.25 each
    rows = HH.heavy_hitters(df, "token", k=5).collect()
    assert {r["value"] for r in rows} == {"a", "b", "c", "d"}
    assert all(r["support"] == pytest.approx(0.25, abs=1e-9) for r in rows)


def test_no_cached_blocks_leak(spark):
    """heavy_hitters is stateless: no persist, no localCheckpoint, no
    registered storage of any kind — under classic PySpark both stay
    registered until session end (py4j never detaches the JVM dataset),
    which is exactly the session-lifetime leak this pins against. The
    strictest possible form: the persistent-RDD registry must not grow
    AT ALL across the call."""
    df = spark.createDataFrame([("x",)] * 50 + [("y",)] * 10, "token string")
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    result = HH.heavy_hitters(df, "token", k=3)
    assert {r["value"] for r in result.collect()} == {"x"}
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    # growth-only assert: the async ContextCleaner may unpersist STALE
    # entries left by earlier tests between the two captures (observed
    # flake), so `after == before` over-constrains; the leak this test
    # pins is heavy_hitters ADDING registry entries of its own
    assert after - before == set()


def test_nulls_ignored_and_k_validation(spark):
    df = spark.createDataFrame(
        [("x",)] * 9 + [(None,)] * 20, "token string"
    )
    got = HH.heavy_hitters(df, "token", k=2).collect()
    # nulls don't count toward n (n=9) and never appear as hitters
    assert [(r["value"], r["n_occurrences"]) for r in got] == [("x", 9)]
    with pytest.raises(ValueError):
        HH.heavy_hitters(df, "token", k=1)
