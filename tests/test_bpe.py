"""BPE merge learning: equivalence with a pure-Python reference
implementation (greedy left-to-right scan — the textbook formulation) on
adversarial token shapes, plus the oracle-parity pin on the real corpus.

The operator applies merges as an expand/single-replace/collapse over
space-delimited symbol strings; these tests are what prove that trick
equals the textbook merge on the shapes where it could plausibly differ:
runs of one symbol at and beyond length 5 ("aaaaa", "aaaaaa" — the shapes
where the old two-pass single-space trick diverged), pair-repeats of 5
("ababababab", which becomes a 5-run of 'ab' after round 1), alternations,
and count ties."""

from __future__ import annotations

import re
from collections import Counter

import pytest

import __spark_entry__ as entrymod
from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators import (
    bpe,
)
from tests.conftest import SF_DIR, assert_matches_oracle

TOKEN_RE = "[a-z0-9]+"


def _ref_bpe(token_freqs: dict[str, int], rounds: int):
    """Textbook BPE: greedy left-to-right non-overlapping merge scan."""
    reprs = {t: list(t) for t in token_freqs}
    merges = []
    for r in range(1, rounds + 1):
        counts: Counter = Counter()
        for t, f in token_freqs.items():
            syms = reprs[t]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        (a, b), f = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((r, f"{a} {b}", a + b, f))
        for t, syms in reprs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            reprs[t] = out
    return merges, reprs


def _run_both(spark, texts: list[str], rounds: int):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r["round"], r["pair"], r["merged"], r["pair_freq"])
        for r in bpe.bpe_merges(df, rounds=rounds).orderBy("round").collect()
    ]
    freqs = Counter(
        tok for t in texts for tok in re.findall(TOKEN_RE, t.lower())
    )
    want, want_reprs = _ref_bpe(dict(freqs), rounds)
    return got, want, want_reprs, df


@pytest.mark.slow
def test_matches_reference_on_adversarial_shapes(spark):
    """Runs, alternations, palindromes: the two-pass replace must produce
    the same merge table as the textbook scan."""
    texts = [
        "aaaa aaa aa ababab abab ab",
        "banana bandana cabana",
        "aaaa ababab banana",
        "mississippi missive misses",
        "aaaaa aaaaaa aaaaaaa",
        "ababababab abababab",
    ] * 3
    got, want, want_reprs, df = _run_both(spark, texts, rounds=8)
    assert got == want, (got, want)
    # the rewritten vocabulary segmentations agree too (stronger: every
    # token's final pieces, not just the winners)
    fitted = bpe._vocab(df, "text", TOKEN_RE)
    from pyspark.sql import functions as F

    cur = fitted
    for _, pair, merged, _f in want:
        cur = cur.withColumn(
            "repr",
            bpe.greedy_merge_expr(F.col("repr"), F.lit(pair), F.lit(merged)),
        )
    pieces = {
        r["token"]: list(r["pieces"]) for r in bpe.bpe_segment(cur).collect()
    }
    assert pieces == want_reprs, (pieces, want_reprs)


def test_tie_breaks_lexicographically(spark):
    """Two pairs with identical counts: the lexicographically smaller pair
    must win in both the operator and the reference."""
    # "xy" and "pq" each appear exactly 5 times as the only pairs
    texts = ["xy pq"] * 5
    got, want, _reprs, _df = _run_both(spark, texts, rounds=2)
    assert got == want
    assert got[0][1] == "p q"  # 'p q' < 'x y'
    assert got[1][1] == "x y"


def test_oracle_parity(spark):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name in ("text_bpe_merges", "text_bpe_segmentation"):
        assert_matches_oracle(qs[name](spark, SF_DIR), oracles[name], SF_DIR)


@pytest.mark.slow
def test_rounds_beyond_exhaustion_are_noops(spark):
    """A vocabulary of 1-2 char tokens exhausts after at most a couple of
    merges; further rounds must be no-ops (absent from the merge table)
    and must NOT corrupt or empty the vocabulary."""
    texts = ["ab a b"] * 3
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    out = bpe.bpe_merges(df, rounds=5).orderBy("round").collect()
    # tokens: 'ab' (one pair a+b), 'a', 'b'. Round 1 merges 'a b' -> 'ab';
    # afterwards every token is a single symbol: no further winners.
    assert [(r["round"], r["pair"]) for r in out] == [(1, "a b")]
    seg = {
        r["token"]: r["pieces"]
        for r in bpe.bpe_segmentation(df, rounds=5).collect()
    }
    assert seg == {"ab": "ab", "a": "a", "b": "b"}
