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
