"""Deterministic hash sampling/splits: reproducibility, fraction accuracy,
monotonicity, and partition-layout independence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators import (
    sampling,
)


@pytest.fixture(scope="module")
def keyed(spark):
    return spark.range(20_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("stratum"),
    )


def test_split_partitions_rows_exactly_once(spark, keyed):
    out = sampling.hash_split(keyed, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 20_000  # no row dropped or duplicated
    # fractions hold to a few percent on 20k uniform hashes
    assert abs(counts["train"] / 20_000 - 0.8) < 0.02
    assert abs(counts["val"] / 20_000 - 0.1) < 0.02
    assert abs(counts["test"] / 20_000 - 0.1) < 0.02


def test_split_is_partitioning_invariant(spark, keyed):
    f = {"train": 0.9, "test": 0.1}
    a = sampling.hash_split(keyed.repartition(3), "k", f).collect()
    b = sampling.hash_split(keyed.repartition(17, "stratum"), "k", f).collect()
    assert {(r["k"], r["split"]) for r in a} == {(r["k"], r["split"]) for r in b}


def test_split_fractions_must_sum_to_one(spark, keyed):
    with pytest.raises(ValueError, match="sum to 1"):
        sampling.hash_split(keyed, "k", {"train": 0.5, "test": 0.1})


def test_salt_decorrelates_decisions(spark, keyed):
    """The split coin and the sample coin over the same key must be
    independent — otherwise the 10% sample of the 10% test split would be
    the SAME 10%, silently correlated."""
    split = sampling.hash_split(keyed, "k", {"a": 0.5, "b": 0.5}, salt="s1")
    resplit = sampling.hash_split(keyed, "k", {"a": 0.5, "b": 0.5}, salt="s2")
    both = (
        split.select("k", F.col("split").alias("s1"))
        .join(resplit.select("k", F.col("split").alias("s2")), "k")
    )
    agree = both.where(F.col("s1") == F.col("s2")).count()
    # independent fair coins agree ~50%; identical salts would agree 100%
    assert 0.45 < agree / 20_000 < 0.55


def test_stratified_sample_monotone_and_per_stratum(spark, keyed):
    small = sampling.stratified_hash_sample(
        keyed, "k", "stratum", {"0": 0.2, "1": 0.5}, default_fraction=0.0
    )
    big = sampling.stratified_hash_sample(
        keyed, "k", "stratum", {"0": 0.6, "1": 1.0}, default_fraction=0.1
    )
    small_keys = {r["k"] for r in small.collect()}
    big_keys = {r["k"] for r in big.collect()}
    assert small_keys <= big_keys  # raising fractions only adds rows
    per = {r["stratum"]: r["n"] for r in small.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert set(per) == {"0", "1"}  # default 0.0 drops strata 2 and 3
    assert abs(per["0"] / 5_000 - 0.2) < 0.03
    assert abs(per["1"] / 5_000 - 0.5) < 0.03


def test_pack_capacity_and_coverage(spark):
    """Every row lands in exactly one pack; no pack exceeds budget + its
    own largest row; oversized rows isolate into their own pack."""
    df = spark.range(5_000).select(
        F.col("id").alias("k"),
        (F.pmod(F.xxhash64("id"), F.lit(700)) + 1).alias("sz"),  # some > budget
    )
    budget = 512
    packed = sampling.pack_greedy_bins(df, "sz", budget, "k", n_bins=4)
    assert packed.count() == 5_000
    per = packed.groupBy("bin", "pack").agg(
        F.sum("sz").alias("tot"), F.max("sz").alias("mx"), F.count("*").alias("n")
    )
    bad = per.where(F.col("tot") > budget + F.col("mx")).count()
    assert bad == 0
    # a row bigger than the budget must sit alone in its pack
    solo = per.where((F.col("mx") > budget) & (F.col("n") > 1)).count()
    assert solo == 0


def test_bucket_matches_generated_sql_contract(spark):
    """The Spark bucket and the generated-DuckDB-SQL bucket are the same
    function: evaluate the generated expression with Spark's SQL parser
    (conv-based form) via a literal translation check on a few keys."""
    import duckdb

    df = spark.range(64).select(F.col("id").alias("k"))
    got = {
        r["k"]: r["bucket"]
        for r in df.select("k", sampling.hash_bucket(F.col("k"), "split")).collect()
    }
    expected = dict(
        duckdb.sql(
            f"SELECT k, {sampling.bucket_sql('k', 'split')} AS b "
            "FROM (SELECT unnest(range(64)) AS k)"
        ).fetchall()
    )
    assert got == expected


def test_null_keys_are_assigned_not_dropped(spark):
    """NULL keys must land in a split (never split=NULL) and participate in
    sampling under their stratum's fraction — in both engines identically."""
    import duckdb

    df = spark.createDataFrame(
        [(None,), (1,), (2,)], "k long"
    )
    out = sampling.hash_split(df, "k", {"a": 0.5, "b": 0.5})
    splits = [r["split"] for r in out.collect()]
    assert None not in splits and len(splits) == 3
    # the generated SQL assigns the NULL key to the same split
    got_null = [s for k, s in zip([r["k"] for r in out.collect()], splits) if k is None][0]
    sql = (
        f"SELECT {sampling.split_case_sql('k', {'a': 0.5, 'b': 0.5})} AS s "
        "FROM (SELECT CAST(NULL AS BIGINT) AS k)"
    )
    assert duckdb.sql(sql).fetchone()[0] == got_null


# ---------------------------------------------------------------------------
# Data-mixture sampling
# ---------------------------------------------------------------------------


def test_mixture_sample_oracle_parity(spark):
    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR, assert_matches_oracle

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert_matches_oracle(
        qs["sample_mixture_tokens"](spark, SF_DIR),
        oracles["sample_mixture_tokens"],
        SF_DIR,
    )


def test_mixture_sample_shares_and_saturation(spark):
    # 3 groups; group "c" is low-resource with an outsized share -> must
    # saturate (keep everything); dominant "a" must be cut far below 100%.
    rows = [(i, "a" if i % 10 < 7 else ("b" if i % 10 < 9 else "c"), 100) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, g string, w long")
    shares = {"a": 0.4, "b": 0.3, "c": 0.3}
    out = sampling.mixture_sample(df, "id", "g", "w", shares, budget_frac=0.5)
    got = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    base = {r["g"]: r["n"] for r in df.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    # c: f = min(1, 0.3*0.5*5000/500) = 1 -> all rows kept
    assert got["c"] == base["c"]
    # a: f = 0.4*0.5*5000/3500 ~= 0.2857 -> binomial around 1000 of 3500
    assert 0.23 < got["a"] / base["a"] < 0.34
    # b: f = 0.3*0.5*5000/1000 = 0.75
    assert 0.70 < got["b"] / base["b"] < 0.80


def test_mixture_sample_monotone_in_budget(spark):
    rows = [(i, "a" if i % 2 == 0 else "b", 10) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, g string, w long")
    shares = {"a": 0.5, "b": 0.5}
    small = {r["id"] for r in sampling.mixture_sample(df, "id", "g", "w", shares, 0.3).collect()}
    large = {r["id"] for r in sampling.mixture_sample(df, "id", "g", "w", shares, 0.7).collect()}
    assert small <= large, "raising the budget must only ADD rows"


def test_mixture_sample_unlisted_group_dropped(spark):
    rows = [(1, "a", 5), (2, "zz", 5)]
    df = spark.createDataFrame(rows, "id long, g string, w long")
    out = sampling.mixture_sample(df, "id", "g", "w", {"a": 1.0}, 1.0).collect()
    assert {r["g"] for r in out} == {"a"}


def test_group_reservoir_two_phase_equals_plain_window(spark):
    """The sharded two-phase ranking must equal the single-window form on a
    deliberately skewed distribution (one group holds ~90% of rows), and
    n_salts=1 degenerates to the plain form."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators import (
        sampling as S,
    )

    hot = spark.range(9000).select(F.lit("hot").alias("g"), F.col("id").alias("k"))
    tail = spark.range(1000).select(
        (F.col("id") % 20).cast("string").alias("g"), (F.col("id") + 100000).alias("k")
    )
    df = hot.unionAll(tail).repartition(13)

    coin = S._coin(F.col("k"), "t")
    w = Window.partitionBy("g").orderBy(coin.asc(), F.col("k").asc())
    plain = {
        (r["g"], r["k"], r["rnk"])
        for r in df.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 7)
        .collect()
    }
    for n_salts in (1, 16):
        got = {
            (r["g"], r["k"], r["rnk"])
            for r in S.group_reservoir(
                df, ["g"], "k", 7, salt="t", n_salts=n_salts
            ).collect()
        }
        assert got == plain, n_salts
    # exactly min(k, group size) rows per group
    sizes = {r["g"]: r["n"] for r in
             S.group_reservoir(df, ["g"], "k", 7, salt="t")
             .groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes["hot"] == 7 and all(v <= 7 for v in sizes.values())


def test_group_reservoir_stable_under_corpus_growth(spark):
    """Adding rows never perturbs which EXISTING rows rank first unless a
    new row genuinely wins a slot: ranks of surviving members only shift
    by new winners, and the sample is a pure function of (key, salt)."""
    from pyspark.sql import functions as F

    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators import (
        sampling as S,
    )

    base = spark.range(500).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    grown = spark.range(800).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    pick = lambda d: {r["k"] for r in S.group_reservoir(d, ["g"], "k", 10, salt="s").collect()}
    a, b = pick(base), pick(grown)
    # every dropped member was displaced by a new key, never reshuffled away
    assert len(a) == len(b) == 10
    assert all(x >= 500 for x in b - a)


# r09 recency-guard backfill (test_session): in-session oracle parity for
# the sampling queries whose last driver row was r04/r05.
ORACLE_QUERIES = [
    "sample_group_reservoir",
    "sample_mixture_tokens",
    "sample_stratified_langs",
    "sample_train_split",
]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR, assert_matches_oracle

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert_matches_oracle(qs[name](spark, SF_DIR), oracles[name], SF_DIR)
