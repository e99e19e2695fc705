"""Salted skew operators: exactness vs the plain formulations on a
deliberately skewed dataset (one key owns ~90% of rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed(spark):
    # 50k rows: key 0 holds 45k (hot), keys 1..100 share the rest
    hot = spark.range(45_000).select(
        F.lit(0).alias("k"), (F.col("id") % 500).alias("v")
    )
    tail = spark.range(5_000).select(
        (F.col("id") % 100 + 1).alias("k"), (F.col("id") % 37).alias("v")
    )
    return hot.unionAll(tail)


@pytest.fixture(scope="module")
def dim(spark):
    return spark.range(101).select(
        F.col("id").alias("dk"), F.concat(F.lit("name_"), F.col("id")).alias("dname")
    )


def test_salted_join_equals_plain(spark, skewed, dim):
    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators import (
        skew,
    )

    plain = skewed.join(dim, skewed.k == dim.dk).select("k", "v", "dname")
    salted = skew.salted_join(skewed, dim, "k", "dk", n_salts=8).select("k", "v", "dname")
    assert salted.count() == plain.count()
    a = salted.groupBy("k", "v", "dname").count()
    b = plain.groupBy("k", "v", "dname").count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_salted_distinct_count_equals_plain(spark, skewed):
    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators import (
        skew,
    )

    got = {
        r["k"]: r["n_distinct"]
        for r in skew.salted_distinct_count(skewed, "k", "v", n_salts=16).collect()
    }
    want = {
        r["k"]: r["nd"]
        for r in skewed.groupBy("k").agg(F.countDistinct("v").alias("nd")).collect()
    }
    assert got == want
    assert want[0] == 500  # the hot key really is hot and really is exact


def test_registry_skew_queries_match_oracle(spark):
    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR, assert_matches_oracle

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name in ("skew_salted_agg", "skew_salted_join"):
        assert_matches_oracle(qs[name](spark, SF_DIR), oracles[name], SF_DIR)


def test_salted_equals_plain_forms(spark):
    """The bench counterparts compute the identical result."""
    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.suites import (
        skewq,
    )
    from tests.conftest import SF_DIR

    a = sorted(map(tuple, skewq.skew_salted_agg(spark, SF_DIR).collect()))
    b = sorted(map(tuple, skewq.skew_plain_agg(spark, SF_DIR).collect()))
    assert a == b
    c = sorted(map(tuple, skewq.skew_salted_join(spark, SF_DIR).collect()))
    d = sorted(map(tuple, skewq.skew_plain_join(spark, SF_DIR).collect()))
    assert c == d


def test_salted_semi_anti_equal_plain(spark, skewed, dim):
    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators import (
        skew,
    )

    # dim covers keys 0..100; restrict to evens so both semi and anti are
    # non-trivial on the hot key's side
    dim_even = dim.where(F.col("dk") % 2 == 0)
    for how in ("left_semi", "left_anti"):
        plain = skewed.join(dim_even, skewed.k == dim_even.dk, how)
        salted = skew.salted_join(skewed, dim_even, "k", "dk", n_salts=8, how=how)
        assert salted.columns == skewed.columns  # big columns only, no __salt
        a = salted.groupBy("k", "v").count()
        b = plain.groupBy("k", "v").count()
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_salted_outer_join_equals_plain(spark, skewed, dim):
    """Full-outer composition: salted left leg + anti-join small-only leg
    must reproduce the plain full outer row for row, across all three row
    classes (matched, big-only, small-only)."""
    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators import (
        skew,
    )

    # shrink dim to keys 50..100 so hot key 0 (45k rows) is UNMATCHED —
    # the straggler case — and keys 1..49 surface big-only too
    dim_part = dim.where(F.col("dk") >= 50)
    plain = (
        skewed.join(dim_part, skewed.k == dim_part.dk, "full_outer")
        .select(
            F.coalesce(F.col("k"), F.col("dk")).alias("k"), "v", "dname"
        )
    )
    salted = skew.salted_outer_join(skewed, dim_part, "k", "dk", n_salts=8)
    assert set(salted.columns) == {"k", "v", "dname"}
    a = salted.groupBy("k", "v", "dname").count()
    b = plain.groupBy("k", "v", "dname").count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_salted_outer_join_null_keys(spark):
    """Null keys match nothing and surface null-extended from their own
    side — SQL semantics on both legs."""
    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators import (
        skew,
    )

    big = spark.createDataFrame(
        [(1, "a"), (None, "b"), (2, "c")], "k int, payload string"
    )
    small = spark.createDataFrame(
        [(1, "x"), (None, "y"), (9, "z")], "sk int, dval string"
    )
    got = {
        (r["k"], r["payload"], r["dval"])
        for r in skew.salted_outer_join(big, small, "k", "sk", n_salts=4).collect()
    }
    assert got == {
        (1, "a", "x"),
        (None, "b", None),   # null big key: kept, never matched
        (2, "c", None),      # unmatched big key
        (None, None, "y"),   # null small key: kept once, null-extended
        (9, None, "z"),      # unmatched small key
    }


def test_salted_join_still_rejects_full_outer(spark, skewed, dim):
    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators import (
        skew,
    )

    with pytest.raises(ValueError):
        skew.salted_join(skewed, dim, "k", "dk", how="full_outer")


def test_skew_gen_pairs_equal(spark):
    """r08 bench pairs (the shapes where mitigation WINS): the two-phase
    window rewrite and the salted full outer must return the exact plain
    results on the generated hot relation (small n for speed; the bench
    runs n=8M)."""
    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.suites import (
        skewq,
    )

    n = 100_000
    key = lambda t: tuple((x is None, x) for x in t)
    a = sorted(
        map(tuple, skewq.skew_plain_window_gen(spark, n).collect()), key=key
    )
    b = sorted(
        map(tuple, skewq.skew_twophase_window_gen(spark, n).collect()), key=key
    )
    assert len(a) == n and a == b
    c = sorted(
        map(tuple, skewq.skew_plain_outer_gen(spark, n).collect()), key=key
    )
    d = sorted(
        map(tuple, skewq.skew_salted_outer_gen(spark, n).collect()), key=key
    )
    assert len(c) == 8 and c == d  # 7 segments + the null row class


def test_skew_twophase_share_oracle_parity(spark):
    import __spark_entry__ as E
    from tests.conftest import SF_DIR, assert_matches_oracle

    assert_matches_oracle(
        E.queries()["skew_twophase_share"](spark, SF_DIR),
        E.oracle_sql()["skew_twophase_share"],
        SF_DIR,
    )


# r09 recency-guard backfill (test_session): in-session oracle parity for
# the salted-skew queries whose last driver row was r04/r05.
ORACLE_QUERIES = [
    "skew_salted_agg",
    "skew_salted_join",
    "skew_salted_outer",
]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    import __spark_entry__ as E
    from tests.conftest import SF_DIR, assert_matches_oracle

    assert_matches_oracle(
        E.queries()[name](spark, SF_DIR), E.oracle_sql()[name], SF_DIR
    )
