"""Corpus-filter suite tests: oracle parity, semantic invariants, and plan
gates for the Gopher rule audit, the CCNet unigram-LM buckets, and the
deterministic epoch shuffle."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.plans import (
    inspect as PI,
)
from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.suites import (
    corpus_filters as CFQ,
)
from tests.conftest import SF_DIR, assert_matches_oracle

ORACLE_QUERIES = [
    "text_gopher_rules",
    "text_unigram_lm_score",
    "pipeline_epoch_shuffle",
]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert_matches_oracle(qs[name](spark, SF_DIR), oracles[name], SF_DIR)


@pytest.fixture(scope="module")
def qs():
    return entrymod.queries()


# --- Gopher rules ----------------------------------------------------------


def test_gopher_rules_accounting(spark, qs):
    """Pass + per-rule-failure accounting is consistent: n_pass <= n_docs,
    every failure count <= n_docs, and a source where every rule's failure
    count is 0 must have n_pass == n_docs."""
    rows = qs["text_gopher_rules"](spark, SF_DIR).collect()
    assert rows, "no sources"
    fail_cols = [
        "fail_word_count",
        "fail_mean_word_len",
        "fail_symbol_ratio",
        "fail_stopword",
        "fail_alpha",
    ]
    for r in rows:
        assert 0 <= r["n_pass"] <= r["n_docs"]
        for c in fail_cols:
            assert 0 <= r[c] <= r["n_docs"], (r["source"], c)
        if all(r[c] == 0 for c in fail_cols):
            assert r["n_pass"] == r["n_docs"]
        # Weak converse: docs failing any single rule bound the pass count.
        assert r["n_pass"] >= r["n_docs"] - sum(r[c] for c in fail_cols)


def test_gopher_rules_plan_zero_joins_one_rollup(spark, qs):
    df = qs["text_gopher_rules"](spark, SF_DIR)
    plan = PI.formatted_plan(df)
    assert not PI.has_cartesian(df), plan
    # tokenize + flags are scan-stage; the only exchange is the rollup
    # (plus AQE's possible post-shuffle coalesce reading as the same node).
    assert PI.count_exchanges(df) <= 1, plan
    PI.assert_column_pruned(df, "n_chars")


# --- Unigram LM buckets ----------------------------------------------------


def test_unigram_buckets_partition_the_corpus(spark, qs):
    """Bucket doc counts sum to the corpus size, and score bounds (scaled
    BIGINT, floor(mean_p·1e9)) respect the fixed thresholds bucket by
    bucket."""
    rows = qs["text_unigram_lm_score"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    head_e9 = CFQ._LM_HEAD * 1e9
    mid_e9 = CFQ._LM_MIDDLE * 1e9
    for r in rows:
        assert r["min_mean_p_e9"] <= r["max_mean_p_e9"]
        if r["bucket"] == "head":
            assert r["min_mean_p_e9"] >= head_e9 - 1
        elif r["bucket"] == "middle":
            assert mid_e9 - 1 <= r["min_mean_p_e9"]
            assert r["max_mean_p_e9"] < head_e9 + 1
        else:
            assert r["max_mean_p_e9"] < mid_e9 + 1


def test_unigram_all_three_buckets_populated(spark, qs):
    """Calibration guard (ADVICE r10): _LM_HEAD/_LM_MIDDLE are pinned to
    the current synthetic corpus's narrow score range, so a testdata
    regeneration that shifts token distributions could silently collapse
    every document into one bucket — the partition/threshold tests above
    would pass vacuously. Require head, middle AND tail to be non-empty
    at SF_DIR so a defeated cutoff fails visibly (fix = recalibrate the
    two constants to the new corpus tertiles)."""
    rows = qs["text_unigram_lm_score"](spark, SF_DIR).collect()
    buckets = {r["bucket"] for r in rows}
    assert buckets == {"head", "middle", "tail"}, (
        f"pinned LM cutoffs no longer discriminate this corpus: only "
        f"{sorted(buckets)} populated — recalibrate _LM_HEAD/_LM_MIDDLE"
    )


def test_unigram_plan_no_cartesian_beyond_scalar(spark, qs):
    """The only nested-loop allowed is the broadcast 1-row corpus-total
    reduction; the token join and the source join are equi/broadcast."""
    df = qs["text_unigram_lm_score"](spark, SF_DIR)
    plan = PI.formatted_plan(df)
    assert plan.count("CartesianProduct") == 0, plan
    assert PI.count_exchanges(df) <= 4, plan


# --- Epoch shuffle ---------------------------------------------------------


def test_epoch_shuffle_is_a_permutation_per_epoch(spark, qs):
    out = qs["pipeline_epoch_shuffle"](spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    rows = out.collect()
    by_epoch: dict[int, list] = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], []).append(r)
    assert sorted(by_epoch) == sorted(CFQ._SHUFFLE_EPOCHS)
    for e, ers in by_epoch.items():
        assert len(ers) == n, f"epoch {e} is not a permutation"
        assert len({r["doc_id"] for r in ers}) == n
        # positions are 1..count within each shard, no gaps
        shards: dict[int, list[int]] = {}
        for r in ers:
            assert 0 <= r["shard"] < CFQ._SHUFFLE_SHARDS
            shards.setdefault(r["shard"], []).append(r["pos"])
        for s, poss in shards.items():
            assert sorted(poss) == list(range(1, len(poss) + 1)), (e, s)


def test_epoch_shuffle_epochs_differ(spark, qs):
    """The two epochs produce different orderings (different salts) —
    the whole point of the reshuffle."""
    rows = qs["pipeline_epoch_shuffle"](spark, SF_DIR).collect()
    key = {}
    for r in rows:
        key.setdefault(r["epoch"], {})[r["doc_id"]] = (r["shard"], r["pos"])
    e0, e1 = (key[e] for e in CFQ._SHUFFLE_EPOCHS)
    moved = sum(1 for d in e0 if e0[d] != e1[d])
    assert moved > len(e0) * 0.5, f"only {moved}/{len(e0)} docs moved between epochs"


def test_epoch_shuffle_plan_sharded_window(spark, qs):
    """No global sort: the window is partitioned by (epoch, shard)."""
    df = qs["pipeline_epoch_shuffle"](spark, SF_DIR)
    plan = PI.formatted_plan(df)
    assert not PI.has_cartesian(df), plan
    # one exchange per epoch branch for the window hash partitioning, plus
    # the union; bound loosely but well below a global-sort shape
    assert PI.count_exchanges(df) <= 3, plan


def test_gopher_rules_crafted_documents(spark):
    """Each rule fails on a document crafted to violate exactly that rule
    (and the clean document passes all five) — checked through
    ``corpus_filters.gopher_flags``, the SAME function the registered
    query calls, so the test cannot drift from the shipped expressions."""
    clean = "the data and for with this from " + " ".join(
        f"word{i:02d}" for i in range(50)
    )  # 57 tokens, stopwords present, mean len ~5, no symbols
    too_short = "the data and word"  # 4 tokens < 50
    long_words = "the and " + " ".join(["extraordinarily"] * 60)  # mean len > 10
    symbol_soup = "the and " + "!@#$%^&*()" * 40 + " " + " ".join(["word"] * 60)
    no_stopwords = " ".join(f"tok{i:02d}" for i in range(60))  # < 2 stopword hits
    numeric = "the and " + " ".join(["12345"] * 60)  # alpha fraction < 0.8

    df = spark.createDataFrame(
        [
            ("clean", clean),
            ("short", too_short),
            ("longw", long_words),
            ("symb", symbol_soup),
            ("nostop", no_stopwords),
            ("numeric", numeric),
        ],
        "source string, text string",
    )
    flags = {r["source"]: r for r in CFQ.gopher_flags(df).collect()}
    assert all(flags["clean"][r] for r in ("r_wc", "r_mwl", "r_sym", "r_stop", "r_alpha"))
    assert not flags["short"]["r_wc"] and flags["short"]["r_mwl"]
    assert not flags["longw"]["r_mwl"] and flags["longw"]["r_wc"]
    assert not flags["symb"]["r_sym"] and flags["symb"]["r_wc"]
    assert not flags["nostop"]["r_stop"] and flags["nostop"]["r_alpha"]
    assert not flags["numeric"]["r_alpha"] and flags["numeric"]["r_stop"]


def test_unigram_lm_rare_tokens_score_low(spark):
    """A document made of corpus-unique tokens must score strictly below a
    document made of the corpus's most common tokens — the CCNet filter
    direction (rare/garbage → tail)."""
    from pyspark.sql import functions as F

    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators import (
        text as T,
    )

    common = " ".join(["the data and"] * 20)
    rare = " ".join(f"zq{i}xv" for i in range(60))
    filler = [(i, "src", "the data and for with this from sort merge join")
              for i in range(2, 40)]
    df = spark.createDataFrame(
        [(0, "src", common), (1, "src", rare), *filler],
        "doc_id long, source string, text string",
    )
    tok = df.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("tok"))
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = tok.count()
    doc = (
        tok.join(freq, "tok")
        .groupBy("doc_id")
        .agg((F.sum("cnt") / F.count(F.lit(1)) / F.lit(total)).alias("mean_p"))
    )
    scores = {r["doc_id"]: r["mean_p"] for r in doc.collect()}
    assert scores[1] < scores[0], scores
