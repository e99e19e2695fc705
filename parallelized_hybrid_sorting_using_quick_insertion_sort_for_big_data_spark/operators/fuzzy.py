"""Fuzzy string matching: edit-distance self-join with deletion-neighborhood
blocking (extension layer, SURVEY §2c — entity resolution / vocabulary
canonicalization; the reference engine has no string operators at all).

Candidate generation is the SymSpell / symmetric-delete scheme: if
``levenshtein(a, b) <= d`` then deleting at most ``d`` characters from each
string reaches a common variant (take any optimal alignment: drop the
inserted/substituted positions from each side — at most ``d`` drops each).
So an equi-join on the ``<=d``-deletion neighborhoods is a COMPLETE blocking
— no cartesian product, no missed pairs — and a final ``levenshtein``
verification filters the false candidates.

Scale shape:

- Variants are generated per-row with JVM higher-order functions
  (``transform`` over ``sequence`` + ``substring``) — zero Python, pipelines
  into the scan. A string of length L yields O(L) variants at d=1 and
  O(L²) at d=2; d>2 is rejected (the neighborhood explodes combinatorially
  — at that radius use n-gram Jaccard / MinHash from operators/dedup.py).
- The join shuffles (variant, string) pairs — bounded by total variant
  count, linear in corpus size for bounded-length strings. A length-band
  predicate (||a|-|b|| <= d, edit distance lower bound) prunes candidates
  before the O(L²) levenshtein verify.
- Meant for VOCABULARIES (distinct strings), the entity-resolution shape:
  dedupe to distinct strings upstream, match the vocabulary, then join
  match pairs back to the id table (tiny-side broadcast).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(s: Column | str, max_deletions: int) -> Column:
    """All distinct strings reachable from ``s`` by deleting at most
    ``max_deletions`` characters (including ``s`` itself), as an
    ``array<string>`` built from pure JVM expressions.

    ``sequence(a, b)`` descends when a > b, so every range is guarded with
    a ``when`` on the string length (empty/1-char inputs stay safe).
    """
    if max_deletions not in (1, 2):
        raise ValueError(
            f"deletion_variants supports max_deletions in {{1, 2}}, got "
            f"{max_deletions}: the d-deletion neighborhood is O(L^d) per "
            "string — use n-gram/MinHash blocking beyond d=2"
        )
    s = F.col(s) if isinstance(s, str) else s
    length = F.length(s)
    empty = F.array().cast("array<string>")

    def drop1(i: Column) -> Column:
        # delete 1-based position i
        return F.concat(s.substr(F.lit(1), i - 1), s.substr(i + 1, length))

    def drop2(i: Column, j: Column) -> Column:
        # delete 1-based positions i < j
        return F.concat(
            s.substr(F.lit(1), i - 1),
            s.substr(i + 1, j - i - 1),
            s.substr(j + 1, length),
        )

    d1 = F.when(
        length >= 1,
        F.transform(F.sequence(F.lit(1), length), drop1),
    ).otherwise(empty)
    parts = [F.array(s), d1]
    if max_deletions == 2:
        d2 = F.when(
            length >= 2,
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), length - 1),
                    lambda i: F.transform(
                        F.sequence(i + 1, length), lambda j: drop2(i, j)
                    ),
                )
            ),
        ).otherwise(empty)
        parts.append(d2)
    return F.array_distinct(F.concat(*parts))


def fuzzy_self_pairs(
    df: DataFrame,
    string_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All unordered pairs of distinct ``string_col`` values within
    ``max_dist`` edit distance: (name_a, name_b, edit_distance) with
    name_a < name_b.

    Deletion-neighborhood equi-join (complete — see module docstring) →
    distinct candidate pairs → length-band prune → exact ``levenshtein``
    verify. Null/empty handling: nulls are dropped (no match semantics for
    null); empty strings participate normally.
    """
    names = (
        df.select(F.col(string_col).alias("name"))
        .where(F.col("name").isNotNull())
        .distinct()
    )
    variants = names.select(
        "name",
        F.length("name").alias("len"),
        F.explode(deletion_variants(F.col("name"), max_dist)).alias("v"),
    )
    a, b = variants.alias("a"), variants.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.v") == F.col("b.v"))
            & (F.col("a.name") < F.col("b.name"))
            # length-band: |len_a - len_b| > d lower-bounds edit distance
            & (F.abs(F.col("a.len") - F.col("b.len")) <= max_dist),
        )
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
        )
        .distinct()
    )
    return cand.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").alias("edit_distance"),
    ).where(F.col("edit_distance") <= max_dist)


def _token_set(s: Column) -> Column:
    """Normalized token SET of a name: lower, split on non-alphanumeric
    runs, drop empties, distinct, sorted. Set semantics (duplicate tokens
    collapse) keep the multiset-free ``array_except`` verification exact."""
    return F.array_sort(
        F.array_distinct(
            F.filter(
                F.split(F.lower(F.trim(s)), "[^a-z0-9]+"),
                lambda t: t != F.lit(""),
            )
        )
    )


def token_fuzzy_self_pairs(
    df: DataFrame,
    string_col: str,
    per_token_dist: int = 1,
) -> DataFrame:
    """Token-level fuzzy matching for MULTI-WORD names — the entity-
    resolution relation word-order noise demands, where whole-string
    ``fuzzy_self_pairs`` fails ("john smith" vs "smith john" is edit
    distance 10): two names match iff their normalized token SETS have the
    same size, differ in at most ONE token per side, and that differing
    token pair is within ``per_token_dist`` edit distance. Permutations and
    re-spacings match at distance 0. Output: (name_a, name_b,
    token_distance), name_a < name_b.

    Candidate generation is SymSpell lifted a level, applied per token:
    for each name, for each token position, emit the key (the OTHER tokens
    joined in sorted order, one ``<=d``-deletion variant of the chosen
    token). Two names in the relation differ in at most the tokens x, y
    with levenshtein(x, y) <= d, so choosing those positions leaves
    identical other-token keys, and the symmetric-delete argument
    (module docstring) guarantees x and y share a deletion variant —
    the equi-join on (others-key, variant) is a COMPLETE blocking, and
    the exact ``array_except`` + ``levenshtein`` verification removes
    false candidates. Names normalizing to an empty token set cannot
    block and are dropped (no-content names have no match semantics).

    Scale shape: everything up to the verify is JVM expressions — variant
    fan-out is sum over tokens of O(len^d) rows per name, the join
    shuffles (key, name) pairs, candidate pairs dedup BEFORE the two
    broadcast re-joins that fetch token arrays for verification. Meant
    for vocabularies (distinct names), like ``fuzzy_self_pairs``.
    """
    toks = (
        df.select(F.col(string_col).alias("name"))
        .where(F.col(string_col).isNotNull())
        .distinct()
        .select("name", _token_set(F.col("name")).alias("ts"))
        .where(F.size("ts") > 0)
    )
    keyed = (
        toks.select(
            "name",
            F.size("ts").alias("n_tok"),
            "ts",
            F.posexplode("ts").alias("pos", "tok"),
        )
        .select(
            "name",
            "n_tok",
            F.concat_ws(
                "\x01",
                F.concat(
                    F.slice("ts", 1, F.col("pos")),
                    F.slice(
                        "ts", F.col("pos") + 2, F.size("ts")
                    ),
                ),
            ).alias("others"),
            F.explode(deletion_variants(F.col("tok"), per_token_dist)).alias("v"),
        )
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.others") == F.col("b.others"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.n_tok") == F.col("b.n_tok"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .select(F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b"))
        .distinct()
    )
    ta = toks.select(F.col("name").alias("name_a"), F.col("ts").alias("ta"))
    tb = toks.select(F.col("name").alias("name_b"), F.col("ts").alias("tb"))
    verified = (
        cand.join(F.broadcast(ta), "name_a")
        .join(F.broadcast(tb), "name_b")
        .withColumn("__da", F.array_except("ta", "tb"))
        .withColumn("__db", F.array_except("tb", "ta"))
        .where(
            (F.size("__da") == F.size("__db"))
            & (F.size("__da") <= 1)
            & (
                (F.size("__da") == 0)
                | (
                    F.levenshtein(
                        F.col("__da").getItem(0), F.col("__db").getItem(0)
                    )
                    <= per_token_dist
                )
            )
        )
    )
    return verified.select(
        "name_a",
        "name_b",
        F.when(F.size("__da") == 0, F.lit(0))
        .otherwise(
            F.levenshtein(F.col("__da").getItem(0), F.col("__db").getItem(0))
        )
        .cast("int")
        .alias("token_distance"),
    )
