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
