"""Data-quality audit pins: every check type counts planted violations
exactly, clean data audits to zero, and the registered query matches its
oracle at sf0.001."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators import (
    quality as Q,
)

CHILD = StructType([StructField("fk", LongType()), StructField("v", LongType())])
PARENT = StructType([StructField("pk", LongType())])


def _audit_map(checks):
    out = Q.audit(checks).collect()
    return {r["check_name"]: r["bad"] for r in out}


def test_planted_violations_counted_exactly(spark):
    child = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (99, 30), (None, 40), (98, 50)], CHILD
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], PARENT)
    got = _audit_map(
        [
            # fk=99 and fk=98 have no parent; NULL fk is excluded by contract
            Q.fk_orphan_check(child, "fk", parent, "pk", "orphans"),
            # fk=1 occurs twice
            Q.uniqueness_check(child, "fk", "dup_fk"),
            Q.null_check(child, "fk", "null_fk"),
            Q.domain_check(child, F.col("v") >= 40, "v_too_big"),
        ]
    )
    assert got == {"orphans": 2, "dup_fk": 1, "null_fk": 1, "v_too_big": 2}


def test_clean_data_audits_to_zero(spark):
    child = spark.createDataFrame([(1, 10), (2, 20)], CHILD)
    parent = spark.createDataFrame([(1,), (2,)], PARENT)
    got = _audit_map(
        [
            Q.fk_orphan_check(child, "fk", parent, "pk", "orphans"),
            Q.uniqueness_check(child, "fk", "dup_fk"),
            Q.null_check(child, "fk", "null_fk"),
        ]
    )
    assert got == {"orphans": 0, "dup_fk": 0, "null_fk": 0}


def test_composite_key_uniqueness(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 2), (2, 1)],
        StructType([StructField("a", LongType()), StructField("b", LongType())]),
    )
    got = _audit_map([Q.uniqueness_check(df, ["a", "b"], "dup_ab")])
    assert got == {"dup_ab": 1}


def test_registered_audit_matches_oracle(spark):
    import __spark_entry__ as E
    from tests.conftest import SF_DIR, assert_matches_oracle

    got = E.queries()["pipeline_data_quality_audit"](spark, SF_DIR)
    assert_matches_oracle(got, E.oracle_sql()["pipeline_data_quality_audit"], SF_DIR)
    # the audit must actually count: this corpus has negative balances
    rows = {r["check_name"]: r["bad"] for r in got.collect()}
    assert rows["domain_customer_negative_acctbal"] > 0
    assert rows["fk_lineitem_orders"] == 0


def test_fd_violations_semantics(spark):
    """Crafted frame: a holding FD reports 0 violations; a violated FD
    counts exactly the determinant groups with >1 dependent value; NULL
    dependents count as a value (cast to string -> distinct)."""
    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators.quality import (
        fd_violations,
    )

    df = spark.createDataFrame(
        [
            (1, "a", "x"), (1, "a", "x"),   # k=1 consistent
            (2, "b", "x"), (2, "b", "y"),   # k=2 violates k->w
            (3, "c", None), (3, "c", None), # NULL dep, consistent
        ],
        "k int, v string, w string",
    )
    out = {r["fd"]: r for r in fd_violations(df, [("k", "v"), ("k", "w")]).collect()}
    assert out["k->v"]["holds"] and out["k->v"]["n_violating"] == 0
    assert not out["k->w"]["holds"] and out["k->w"]["n_violating"] == 1
    assert out["k->v"]["n_groups"] == out["k->w"]["n_groups"] == 3


def test_k_anonymity_crafted(spark):
    """Known-answer check: a singleton class drives k to 1; a class whose
    sensitive attribute is constant drives min-l to 1 even at high k."""
    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators.quality import (
        k_anonymity,
    )

    rows = (
        [("X", "u", i) for i in range(5)]        # class (X,u): n=5, l=5
        + [("X", "v", 7), ("X", "v", 7), ("X", "v", 7)]  # n=3, l=1 (leaky)
        + [("Y", "u", 1)]                        # singleton: n=1, l=1
    )
    df = spark.createDataFrame(rows, "q1 string, q2 string, s int")
    out = k_anonymity(df, ["q1", "q2"], "s").collect()[0]
    assert out["n_rows"] == 9 and out["n_classes"] == 3
    assert out["k_anonymity"] == 1 and out["n_singleton_classes"] == 1
    assert out["min_l_diversity"] == 1 and out["n_low_diversity_classes"] == 2


def test_new_operator_param_validation(spark):
    """Bad parameters fail fast with ValueError, before any job runs."""
    import pytest as _pt

    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators import (
        behavior as B,
        dedup as D,
        quality as Q,
        scd as S,
    )

    df = spark.createDataFrame([(1, "a")], "doc_id int, text string")
    with _pt.raises(ValueError):
        D.sorted_neighborhood_pairs(df, window=0)
    with _pt.raises(ValueError):
        D.sorted_neighborhood_pairs(df, threshold=0.0)
    with _pt.raises(ValueError):
        S.cdc_apply(df, key_cols=[], seq_cols=["doc_id"])
    with _pt.raises(ValueError):
        B.copurchase_similarity(df, min_support=0)
    with _pt.raises(ValueError):
        Q.fd_violations(df, [])
    with _pt.raises(ValueError):
        Q.k_anonymity(df, [], "text")
