"""Count-Min Sketch invariants: one-sided error, absent-value zero,
partitioning invariance, and parameter validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators import (
    sketch as SK,
)


def _vals(spark, values, parts=1):
    return spark.createDataFrame([(v,) for v in values], "value string").repartition(
        parts
    )


def test_estimate_never_undercounts_and_hits_exact_without_collisions(spark):
    values = ["a"] * 50 + ["b"] * 30 + ["c"] * 7 + [f"t{i}" for i in range(40)]
    df = _vals(spark, values)
    cms = SK.cms_build(df, "value", depth=4, width=1024)
    exact = df.groupBy("value").agg(F.count(F.lit(1)).alias("exact_n"))
    est = SK.cms_estimate(cms, exact, value_col="value", depth=4, width=1024)
    rows = est.collect()
    assert len(rows) == 43
    assert all(r["cms_est"] >= r["exact_n"] for r in rows)
    # 43 distinct values in 4 rows of 1024 cells: expect ~zero collisions on
    # at least one row per value, so the min equals exact for the heads
    heads = {r["value"]: (r["exact_n"], r["cms_est"]) for r in rows}
    assert heads["a"] == (50, 50) and heads["b"] == (30, 30)


def test_absent_value_estimates_zero_and_partitioning_invariance(spark):
    df1 = _vals(spark, ["x"] * 9 + ["y"] * 4, parts=1)
    df13 = _vals(spark, ["x"] * 9 + ["y"] * 4, parts=13)
    probes = spark.createDataFrame([("x",), ("zzz",)], "value string")
    outs = []
    for df in (df1, df13):
        cms = SK.cms_build(df, "value", depth=3, width=64)
        outs.append(
            {
                r["value"]: r["cms_est"]
                for r in SK.cms_estimate(
                    cms, probes, value_col="value", depth=3, width=64
                ).collect()
            }
        )
    assert outs[0] == outs[1]
    assert outs[0]["x"] == 9 and outs[0]["zzz"] == 0


def test_shard_merge_equals_whole_corpus_sketch(spark):
    """Sketching shards independently then cms_merge-ing must equal the
    single-pass sketch of the union — the mergeability contract."""
    a = ["x"] * 5 + ["y"] * 3 + [f"a{i}" for i in range(20)]
    b = ["x"] * 2 + ["z"] * 7 + [f"b{i}" for i in range(15)]
    whole = SK.cms_build(_vals(spark, a + b), "value", depth=3, width=128)
    merged = SK.cms_merge(
        SK.cms_build(_vals(spark, a), "value", depth=3, width=128),
        SK.cms_build(_vals(spark, b), "value", depth=3, width=128),
    )
    assert {tuple(r) for r in whole.collect()} == {tuple(r) for r in merged.collect()}
    with pytest.raises(ValueError):
        SK.cms_merge()


def test_param_validation(spark):
    df = _vals(spark, ["a"])
    with pytest.raises(ValueError):
        SK.cms_build(df, "value", depth=0)
    with pytest.raises(ValueError):
        SK.bloom_build(df, "value", m_bits=0)
    # positions come from a 32-bit md5 prefix: widths beyond 2^32 would
    # silently never occupy high cells (degraded FP rate, no error) — the
    # builders must reject them (ADVICE r04)
    with pytest.raises(ValueError, match="2\\^32"):
        SK.bloom_build(df, "value", m_bits=(1 << 32) + 1)
    with pytest.raises(ValueError, match="2\\^32"):
        SK.cms_build(df, "value", width=(1 << 32) + 1)
    # the bound itself is allowed
    SK.bloom_build(df, "value", m_bits=1 << 32)
    SK.cms_build(df, "value", width=1 << 32)


def test_bloom_no_false_negatives_and_low_fp(spark):
    members = [f"member{i}" for i in range(200)]
    others = [f"other{i}" for i in range(1000)]
    bloom = SK.bloom_build(_vals(spark, members), "value", m_bits=65536, k_hashes=4)
    probes = _vals(spark, members + others)
    got = {
        r["value"]: r["bloom_hit"]
        for r in SK.bloom_contains(
            probes, bloom, "value", m_bits=65536, k_hashes=4
        ).collect()
    }
    # membership NEVER misses
    assert all(got[m] for m in members)
    # false-positive rate with n=200, m=64Ki, k=4: (1-e^(-kn/m))^k ~ 2e-8;
    # allow a generous bound
    fps = sum(1 for o in others if got[o])
    assert fps <= 2
