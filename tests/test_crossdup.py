"""Pins for crossdup_coverage: hand-computed coverage on a tiny corpus,
interval-merge correctness, within-doc-only repetition excluded, short-doc
and validation edges, and oracle parity at sf0.001."""

from __future__ import annotations

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators import (
    dedup,
)

DOC_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def _cov(spark, docs, n=3, min_df=2):
    df = spark.createDataFrame(docs, DOC_SCHEMA)
    return {
        r["doc_id"]: (r["n_tokens"], r["covered_tokens"], r["dup_frac"])
        for r in dedup.crossdup_coverage(df, n=n, min_df=min_df).collect()
    }


def test_hand_computed_coverage(spark):
    out = _cov(
        spark,
        [
            (1, "a b c d e f"),        # shares "a b c d e" with doc 2
            (2, "x x a b c d e y"),    # the 3 shared 3-grams cover tokens 3..7
            (3, "p q r p q r"),        # repeats ONLY within itself -> df=1
            (4, "zz"),                 # shorter than n: no grams at all
        ],
    )
    assert out[1] == (6, 5, pytest.approx(5 / 6))
    assert out[2] == (8, 5, pytest.approx(5 / 8))
    assert out[3] == (6, 0, 0.0), "within-doc repetition must not count"
    assert out[4] == (1, 0, 0.0)


def test_disjoint_spans_sum_without_double_count(spark):
    # "a b c" and "p q r" both duplicated; in doc 1 they sit disjoint with
    # a gap -> covered = 3 + 3; overlapping grams inside "a b c d" merge
    out = _cov(
        spark,
        [
            (1, "a b c g g g p q r"),
            (2, "a b c"),
            (3, "p q r"),
        ],
    )
    assert out[1] == (9, 6, pytest.approx(6 / 9))
    assert out[2] == (3, 3, 1.0)
    assert out[3] == (3, 3, 1.0)


def test_full_overlap_chain_merges_into_one_interval(spark):
    # doc 2 contains doc 1 entirely; doc 1 is 100% covered and the three
    # overlapping grams in doc 2 merge into one 5-token interval
    out = _cov(
        spark,
        [
            (1, "m n o p q"),
            (2, "zz m n o p q zz"),
        ],
    )
    assert out[1] == (5, 5, 1.0)
    assert out[2] == (7, 5, pytest.approx(5 / 7))


def test_validation(spark):
    df = spark.createDataFrame([(1, "a b c")], DOC_SCHEMA)
    with pytest.raises(ValueError):
        dedup.crossdup_coverage(df, n=0)
    with pytest.raises(ValueError):
        dedup.crossdup_coverage(df, min_df=1)


def test_oracle_parity_small_sf(spark):
    import __spark_entry__ as E
    from tests.conftest import SF_DIR, assert_matches_oracle

    got = E.queries()["text_crossdup_coverage"](spark, SF_DIR)
    assert_matches_oracle(got, E.oracle_sql()["text_crossdup_coverage"], SF_DIR)


def _brute_coverage(docs, n=3, min_df=2):
    """Brute-force single-process reference: same tokenizer, same interval
    union, computed naively."""
    import re

    toks = {d: re.findall(r"[a-z0-9]+", t.lower()) for d, t in docs}
    grams = {
        d: [tuple(ts[i : i + n]) for i in range(len(ts) - n + 1)]
        for d, ts in toks.items()
    }
    df_count = {}
    for d, gs in grams.items():
        for g in set(gs):
            df_count[g] = df_count.get(g, 0) + 1
    dup = {g for g, c in df_count.items() if c >= min_df}
    out = {}
    for d, ts in toks.items():
        covered = set()
        for i, g in enumerate(grams[d]):
            if g in dup:
                covered.update(range(i, i + n))
        nt = len(ts)
        out[d] = (nt, len(covered), (len(covered) / nt) if nt else 0.0)
    return out


@pytest.mark.slow
def test_matches_brute_force_on_random_corpora(spark):
    """Randomized equivalence: 5 corpora of 12 docs over a 4-word alphabet
    (maximizing shared grams, overlaps, and within-doc repeats) must match
    the naive reference exactly."""
    import random

    rng = random.Random(4242)
    words = ["aa", "bb", "cc", "dd"]
    for trial in range(5):
        docs = [
            (i, " ".join(rng.choice(words) for _ in range(rng.randrange(0, 15))))
            for i in range(12)
        ]
        got = _cov(spark, docs, n=3, min_df=2)
        want = _brute_coverage(docs, n=3, min_df=2)
        for d in want:
            nt, cov, frac = want[d]
            g_nt, g_cov, g_frac = got[d]
            assert (g_nt, g_cov) == (nt, cov), f"trial={trial} doc={d}"
            assert g_frac == pytest.approx(frac), f"trial={trial} doc={d}"
