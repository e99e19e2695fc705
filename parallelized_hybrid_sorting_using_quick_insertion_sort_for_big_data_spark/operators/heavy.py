"""Heavy hitters: exact frequent-item detection with bounded-state candidate
generation (extension layer, SURVEY §2c). The canonical two-pass scheme for
"which tokens/users/keys exceed φ·n occurrences" over streams whose distinct
universe is far too large to groupBy:

1. **Candidate pass** — per-partition local frequency pruning inside
   ``mapInPandas``: a partition with n_p rows emits only values whose LOCAL
   count exceeds n_p/k (strictly fewer than k values per partition), plus
   one partition-total row. Completeness is the weighted-pigeonhole
   argument: if a value's local frequency ≤ n_p/k in EVERY partition, its
   global frequency ≤ n/k — so the union of local survivors is a superset
   of every global heavy hitter. No shuffle: the full distinct universe
   never crosses the wire.
2. **Exact pass** — the tiny candidate set is broadcast as a left-semi
   filter and only candidate rows are counted exactly. The output is
   EXACT counts for exactly the values with count > n/k — not an estimate.

Versus a plain ``groupBy(col).count()``: the shuffle there carries one row
per distinct value per partition (a token universe at 100 TB is billions);
here the shuffle carries only candidate hits (< k per partition). The
operator is STATELESS by design: the row total comes from a column-pruned
JVM-only ``count()`` (no Python), and the candidate pass executes lazily
inside the returned plan — no ``persist`` (which leaked session-lifetime
blocks), no ``localCheckpoint`` (whose RDDs stay registered until session
end under classic PySpark — py4j never detaches the JVM-side dataset), and
no multi-million-row driver collect at the 100k-partition worst case. The
price is one extra column-pruned scan next to the two the algorithm needs.

Arrow-batched ``value_counts`` does the local pruning vectorized — the
per-partition distinct set is bounded by the partition size
(``spark.sql.files.maxPartitionBytes``), not the global universe.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CAND_SCHEMA = "value string"


def _local_prune(k: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        total = 0
        for b in batches:
            total += len(b)
            for v, c in b["value"].value_counts().items():
                counts[v] = counts.get(v, 0) + int(c)
        survivors = [v for v, c in counts.items() if c * k > total]
        yield pd.DataFrame({"value": survivors})

    return gen


def heavy_hitters(df: DataFrame, value_col: str, k: int) -> DataFrame:
    """Exact heavy hitters of ``value_col``: every value occurring more than
    ``n/k`` times (n = row count), with its exact count and global support
    fraction. Output: (value, n_occurrences, support) — support rounded
    to 9.

    Null values are ignored (null is an absence, not a hitter).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    vals = df.select(F.col(value_col).cast("string").alias("value")).where(
        F.col("value").isNotNull()
    )
    # The row total is the ONLY scalar the plan needs up front; taking it
    # from a dedicated column-pruned count() (JVM-only, no Python) keeps
    # the operator stateless — the bounded candidate relation (< k survivor
    # rows per partition, ~10M rows at the k=100 / 100k-partition worst
    # case) then flows lazily into the broadcast build inside the returned
    # plan, never through the driver and never through persisted or
    # checkpointed blocks that would outlive the query.
    total_n = vals.count()
    cand = vals.mapInPandas(_local_prune(k), _CAND_SCHEMA).distinct()
    exact = (
        vals.join(F.broadcast(cand), "value", "left_semi")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return exact.where(F.col("n_occurrences") * k > F.lit(total_n)).select(
        "value",
        "n_occurrences",
        F.round(F.col("n_occurrences") / F.lit(total_n), 9).alias("support"),
    )
