"""Fuzzy matching: deletion-neighborhood variant generation, completeness of
the SymSpell blocking vs brute-force levenshtein, edge cases, plan gate."""

from __future__ import annotations

import itertools
import random

import pytest

import __spark_entry__ as entrymod
from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators import (
    fuzzy as FZ,
)
from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.plans import (
    inspect as PI,
)
from tests.conftest import SF_DIR

from pyspark.sql import functions as F


def _variants_py(s: str, d: int) -> set[str]:
    out = {s}
    frontier = {s}
    for _ in range(d):
        nxt = set()
        for t in frontier:
            for i in range(len(t)):
                nxt.add(t[:i] + t[i + 1 :])
        out |= nxt
        frontier = nxt
    return out


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.mark.parametrize("d", [1, 2])
def test_deletion_variants_match_python_reference(spark, d):
    words = ["", "a", "ab", "abc", "hello", "small ring", "aaaa"]
    df = spark.createDataFrame([(w,) for w in words], "s string")
    got = {
        r["s"]: set(r["v"])
        for r in df.select(
            "s", FZ.deletion_variants(F.col("s"), d).alias("v")
        ).collect()
    }
    for w in words:
        assert got[w] == _variants_py(w, d), (w, d)


def test_deletion_variants_rejects_d3(spark):
    with pytest.raises(ValueError):
        FZ.deletion_variants(F.lit("x"), 3)


@pytest.mark.parametrize("d", [1, 2])
def test_fuzzy_pairs_complete_vs_brute_force(spark, d):
    # random short strings over a tiny alphabet → dense near-neighborhoods
    rng = random.Random(7)
    words = sorted(
        {"".join(rng.choice("abc") for _ in range(rng.randint(0, 6))) for _ in range(60)}
    )
    expected = {
        (a, b)
        for a, b in itertools.combinations(words, 2)
        if _lev(a, b) <= d
    }
    df = spark.createDataFrame([(w,) for w in words], "s string")
    got = {
        (r["name_a"], r["name_b"])
        for r in FZ.fuzzy_self_pairs(df, "s", max_dist=d).collect()
    }
    assert got == expected, f"missing={expected - got} extra={got - expected}"


def test_fuzzy_pairs_distance_values_exact(spark):
    df = spark.createDataFrame(
        [("kitten",), ("sitten",), ("sittin",), ("kitten",)], "s string"
    )
    rows = {
        (r["name_a"], r["name_b"]): r["edit_distance"]
        for r in FZ.fuzzy_self_pairs(df, "s", max_dist=2).collect()
    }
    assert rows[("kitten", "sitten")] == 1
    assert rows[("sitten", "sittin")] == 1
    assert rows[("kitten", "sittin")] == 2


def test_fuzzy_pairs_null_safe(spark):
    df = spark.createDataFrame([("ab",), (None,), ("ac",)], "s string")
    got = FZ.fuzzy_self_pairs(df, "s", max_dist=1).collect()
    assert {(r["name_a"], r["name_b"]) for r in got} == {("ab", "ac")}


def test_fuzzy_query_no_cartesian(spark):
    qs = entrymod.queries()
    df = qs["fuzzy_name_match"](spark, SF_DIR)
    assert not PI.has_cartesian(df)
