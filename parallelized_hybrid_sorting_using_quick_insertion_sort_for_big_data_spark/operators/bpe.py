"""BPE merge-rule learning (Sennrich et al. 2016): the tokenizer-training
step of an LLM data pipeline, on Spark (extension layer, SURVEY §2c "token
counting (whitespace + a BPE-ish regex)" taken to its conclusion — not just
counting tokens but LEARNING the subword merge table).

Algorithm: start from the corpus token vocabulary with each token split
into characters; for each of ``rounds`` iterations, count adjacent symbol
pairs weighted by token frequency, pick the most frequent pair
(ties → lexicographically smaller), and merge every non-overlapping
occurrence greedily left-to-right.

Scale shape: the corpus is read ONCE (token frequency aggregation); every
subsequent round runs over the VOCABULARY relation (|vocab| rows, ~10^4-10^6
regardless of corpus size — the whole point of operating on the frequency
table instead of the corpus). Per round: one explode + partial-agg shuffle
of (pair, freq) partials, a top-1 TakeOrderedAndProject, and a broadcast
cross-join of the 1-row winner to rewrite representations — the corpus
never participates again. Each round's vocabulary is pinned with an eager
``localCheckpoint`` (same lineage cut as ``similarity.kmeans_fit``), so the
plan stays flat at any ``rounds``.

Merge application = expand / single-pass literal ``replace`` / collapse on
the space-delimited symbol string: double every delimiter space, replace
" A  B " with " AB " in one pass, halve the delimiters back. With doubled
delimiters each match consumes exactly ONE boundary space from each side,
leaving the other for the adjacent candidate, so consecutive eligible
occurrences are char-disjoint and a single left-to-right pass merges
precisely the occurrences the textbook greedy scan merges — including runs
of the same symbol (" a a a a a " → [aa, aa, a], where the previous
two-pass single-space trick wrongly produced [aa, a, aa]; see
tests/test_bpe.py adversarial runs ≥5). A pattern can only anchor on the
space directly before a symbol (symbols contain no spaces), replacements
are never rescanned, and after the pass every surviving delimiter is
exactly two spaces, so the collapse restores canonical form exactly. Both
engines share literal-replace semantics, which is what makes the whole
iterative fit reproducible by the generated DuckDB oracle
(``bpe_oracle_sql``), round for round, value for value — the same
unrolled-CTE technique as the k-means codebook oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import TOKEN_RE


def _vocab(df: DataFrame, text_col: str, token_re: str) -> DataFrame:
    """(token, freq, repr) with repr = ' c1 c2 … cn ' (space-wrapped
    character split)."""
    from ..sources.tables import spread_scan

    toks = spread_scan(df).select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(token_re), 0)
        ).alias("token")
    )
    return toks.groupBy("token").agg(F.count(F.lit(1)).alias("freq")).withColumn(
        "repr",
        F.concat(F.lit(" "), F.regexp_replace(F.col("token"), "(.)", "$1 ")),
    )


def greedy_merge_expr(repr_col, pair_col, merged_col):
    """Greedy left-to-right non-overlapping merge of ``pair_col`` ("A B")
    into ``merged_col`` ("AB") over a space-wrapped symbol string, as pure
    literal replaces: expand delimiters to two spaces, single-pass replace
    " A  B " → " AB " (each match keeps one boundary space per side for its
    neighbour, so adjacent eligible occurrences stay char-disjoint — exact
    greedy semantics even on same-symbol runs), collapse delimiters back."""
    pat = F.concat(
        F.lit(" "), F.replace(pair_col, F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    rep = F.concat(F.lit(" "), merged_col, F.lit(" "))
    expanded = F.replace(repr_col, F.lit(" "), F.lit("  "))
    return F.replace(F.replace(expanded, pat, rep), F.lit("  "), F.lit(" "))


def bpe_fit(
    df: DataFrame,
    text_col: str = "text",
    rounds: int = 6,
    token_re: str = TOKEN_RE,
) -> tuple[list[DataFrame], DataFrame]:
    """Run the fit; returns (per-round 1-row winner frames, the rewritten
    (token, freq, repr) vocabulary after all rounds)."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    cur = _vocab(df, text_col, token_re).localCheckpoint(eager=True)
    winners = []
    for r in range(1, rounds + 1):
        syms = F.filter(F.split(F.col("repr"), " "), lambda x: x != "")
        with_syms = cur.select("freq", syms.alias("syms"))
        pairs = with_syms.where(F.size("syms") >= 2).select(
            "freq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("syms") - 2),
                    lambda i: F.concat(
                        F.element_at(F.col("syms"), i + 1),
                        F.lit(" "),
                        F.element_at(F.col("syms"), i + 2),
                    ),
                )
            ).alias("pair"),
        )
        win = (
            pairs.groupBy("pair")
            .agg(F.sum("freq").alias("pair_freq"))
            .orderBy(F.desc("pair_freq"), F.asc("pair"))
            .limit(1)
            .select(
                F.lit(r).cast("bigint").alias("round"),
                "pair",
                F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias("merged"),
                "pair_freq",
            )
            .localCheckpoint(eager=True)
        )
        winners.append(win)
        # Exhaustion-safe rewrite: if every token is already a single
        # symbol the winner relation is EMPTY — a crossJoin would wipe the
        # vocabulary, so the winner attaches via a constant-key LEFT join
        # and a null winner makes the round a no-op (the oracle mirrors
        # this with a chr(0) never-matching pattern).
        cur = (
            cur.withColumn("__k", F.lit(1))
            .join(
                F.broadcast(
                    win.select(
                        F.lit(1).alias("__k"),
                        F.col("pair").alias("__pair"),
                        F.col("merged").alias("__merged"),
                    )
                ),
                "__k",
                "left",
            )
            .withColumn(
                "repr",
                # cheap containment pre-filter: a row can only change if the
                # single-delimiter form " A B " occurs in its repr (the
                # doubled-delimiter pattern matches iff this does), so the
                # vast majority of vocab rows skip the 3-replace rewrite
                # chain each round — semantics identical, the oracle's
                # unconditional replace is a no-op on exactly those rows
                F.when(
                    F.col("__pair").isNotNull()
                    & F.contains(
                        F.col("repr"),
                        F.concat(F.lit(" "), F.col("__pair"), F.lit(" ")),
                    ),
                    greedy_merge_expr(
                        F.col("repr"), F.col("__pair"), F.col("__merged")
                    ),
                ).otherwise(F.col("repr")),
            )
            .drop("__k", "__pair", "__merged")
            .localCheckpoint(eager=True)
        )
    return winners, cur


def bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    rounds: int = 6,
    token_re: str = TOKEN_RE,
) -> DataFrame:
    """Learn the first ``rounds`` BPE merge rules from the corpus.

    Returns one row per round: (round, pair, merged, pair_freq) — e.g.
    (1, 'e r', 'er', 4650). Deterministic: pair counts are integer sums,
    ties break lexicographically."""
    winners, _vocab_after = bpe_fit(df, text_col, rounds, token_re)
    out = winners[0]
    for w in winners[1:]:
        out = out.unionByName(w)
    return out


def bpe_segmentation(
    df: DataFrame,
    text_col: str = "text",
    rounds: int = 6,
    token_re: str = TOKEN_RE,
) -> DataFrame:
    """Every vocabulary token's segmentation under the learned merges:
    (token, freq, pieces) with pieces space-joined — the full end-state of
    the fit, one row per distinct token. Value-checking THIS relation is a
    far stronger equivalence claim than the merge table alone: every
    token's rewrite chain must agree across engines."""
    _winners, vocab_after = bpe_fit(df, text_col, rounds, token_re)
    return vocab_after.select(
        "token", "freq", F.trim(F.col("repr")).alias("pieces")
    )


def bpe_segment(vocab: DataFrame) -> DataFrame:
    """Expose the post-merge segmentation: (token, freq, pieces array) —
    what the learned rules do to every vocabulary entry. ``vocab`` is the
    (token, freq, repr) relation after the fit's rewrite rounds."""
    return vocab.select(
        "token",
        "freq",
        F.filter(F.split(F.col("repr"), " "), lambda x: x != "").alias("pieces"),
    )


def bpe_oracle_sql(
    rounds: int = 6,
    table: str = "documents",
    text_col: str = "text",
    token_re: str = TOKEN_RE,
) -> str:
    """DuckDB SQL reproducing :func:`bpe_merges` EXACTLY — the iterative
    fit unrolled as one CTE chain per round (the k-means-oracle technique):
    same token vocabulary, same pair counts, same (freq DESC, pair ASC)
    winner, same expand/replace/collapse greedy rewrite. Every CTE is
    MATERIALIZED:
    DuckDB inlines plain CTEs per reference, which re-evaluates the whole
    chain exponentially across rounds (measured: minutes at rounds=6 vs
    sub-second materialized)."""
    body = ",".join(_ORACLE_ROUND(r) for r in range(1, rounds + 1))
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS round, pair, merged, pair_freq FROM t{r}"
        for r in range(1, rounds + 1)
    )
    return _bpe_sql_prefix(table, text_col, token_re) + body + f"\n{union}\n"


def bpe_segmentation_oracle_sql(
    rounds: int = 6,
    table: str = "documents",
    text_col: str = "text",
    token_re: str = TOKEN_RE,
) -> str:
    """DuckDB SQL reproducing :func:`bpe_segmentation`: the same unrolled
    fit, projecting the FINAL rewritten vocabulary instead of the winners —
    every token's (freq, pieces) is value-checked."""
    body = ",".join(_ORACLE_ROUND(r) for r in range(1, rounds + 1))
    return (
        _bpe_sql_prefix(table, text_col, token_re)
        + body
        + f"\nSELECT token, freq, trim(repr) AS pieces FROM w{rounds}\n"
    )


def _ORACLE_ROUND(r: int) -> str:
    """One round's CTE chain: symbols → pair counts → winner → rewrite."""
    return f"""
s{r} AS MATERIALIZED (
  SELECT token, freq, list_filter(string_split(repr, ' '), x -> x <> '') AS syms, repr
  FROM w{r - 1}
),
p{r} AS MATERIALIZED (
  SELECT syms[i] || ' ' || syms[i+1] AS pair, CAST(sum(freq) AS BIGINT) AS pair_freq
  FROM s{r}, unnest(generate_series(1, len(syms) - 1)) AS t(i)
  GROUP BY 1
),
t{r} AS MATERIALIZED (
  SELECT pair, replace(pair, ' ', '') AS merged, pair_freq
  FROM p{r} ORDER BY pair_freq DESC, pair LIMIT 1
),
w{r} AS MATERIALIZED (
  SELECT token, freq,
         replace(replace(replace(repr, ' ', '  '),
            ' ' || replace(coalesce((SELECT pair FROM t{r}), chr(0)), ' ', '  ') || ' ',
            ' ' || coalesce((SELECT merged FROM t{r}), chr(0)) || ' '),
            '  ', ' ') AS repr
  FROM s{r}
)"""


def _bpe_sql_prefix(table: str, text_col: str, token_re: str) -> str:
    return f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower({text_col}), '{token_re}')) AS token
  FROM {table}
),
w0 AS MATERIALIZED (
  SELECT token, count(*) AS freq,
         ' ' || regexp_replace(token, '(.)', '\\1 ', 'g') AS repr
  FROM toks GROUP BY token
),"""
