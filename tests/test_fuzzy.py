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


def _token_relation_py(names: list[str], d: int) -> set[tuple[str, str, int]]:
    """Brute-force reference for token_fuzzy_self_pairs: cross-join over
    normalized token sets, at most one differing token per side within
    edit distance d."""
    import re

    def tset(s: str) -> tuple[str, ...]:
        return tuple(sorted({t for t in re.split(r"[^a-z0-9]+", s.lower().strip()) if t}))

    out = set()
    for a, b in itertools.combinations(sorted(set(names)), 2):
        ta, tb = tset(a), tset(b)
        if not ta or not tb or len(ta) != len(tb):
            continue
        da = [t for t in ta if t not in tb]
        db = [t for t in tb if t not in ta]
        if len(da) != len(db) or len(da) > 1:
            continue
        if da and _lev(da[0], db[0]) > d:
            continue
        out.add((a, b, _lev(da[0], db[0]) if da else 0))
    return out


@pytest.fixture(scope="module")
def multiword_names():
    rng = random.Random(7)
    toks = ["alpha", "beta", "gamma", "delta", "omega", "zeta"]
    names = [
        "john smith", "smith  john", "jon smith", "john smyth",
        "mary jones", "mary joness", "jones mary kate", "kate mary jones",
        "solo", "slo", "so-lo", "###", "a b c", "c b a", "a b d",
    ]
    for _ in range(40):
        names.append(" ".join(rng.sample(toks, rng.randint(1, 3))))
    return names


def test_token_fuzzy_matches_bruteforce_d1(spark, multiword_names):
    df = spark.createDataFrame([(n,) for n in multiword_names], "name string")
    got = {
        (r["name_a"], r["name_b"], r["token_distance"])
        for r in FZ.token_fuzzy_self_pairs(df, "name", per_token_dist=1).collect()
    }
    assert got == _token_relation_py(multiword_names, 1)
    # the fixture really exercises every class: permutation (distance 0),
    # near-token (distance 1), and non-matches
    assert any(dist == 0 for _, _, dist in got)
    assert any(dist == 1 for _, _, dist in got)


def test_token_fuzzy_d2_completeness_preserved(spark, multiword_names):
    """per_token_dist=2 rides the same deletion_variants(d=2) machinery —
    the blocking must stay complete at the wider radius too."""
    df = spark.createDataFrame([(n,) for n in multiword_names], "name string")
    got = {
        (r["name_a"], r["name_b"], r["token_distance"])
        for r in FZ.token_fuzzy_self_pairs(df, "name", per_token_dist=2).collect()
    }
    assert got == _token_relation_py(multiword_names, 2)
    assert any(dist == 2 for _, _, dist in got)


def test_token_fuzzy_edge_semantics(spark):
    df = spark.createDataFrame(
        [("john smith",), ("smith john",), ("###",), ("!!!",), (None,)],
        "name string",
    )
    got = {
        (r["name_a"], r["name_b"], r["token_distance"])
        for r in FZ.token_fuzzy_self_pairs(df, "name").collect()
    }
    # permutations at distance 0; empty-token-set names and nulls drop out
    assert got == {("john smith", "smith john", 0)}


def test_token_fuzzy_query_matches_oracle(spark):
    from tests.conftest import assert_matches_oracle

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert_matches_oracle(
        qs["fuzzy_token_match"](spark, SF_DIR), oracles["fuzzy_token_match"], SF_DIR
    )


# r09 recency-guard backfill (test_session): list-convention parity pins
# (fuzzy_token_match already had an inline assert_matches_oracle test; the
# guard recognizes the list form, and fuzzy_name_match gains its first
# value-level pin).
ORACLE_QUERIES = [
    "fuzzy_name_match",
    "fuzzy_token_match",
]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    from tests.conftest import assert_matches_oracle

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert_matches_oracle(qs[name](spark, SF_DIR), oracles[name], SF_DIR)
