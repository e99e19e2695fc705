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
here the shuffle carries only candidate hits (< k per partition) and the
candidate/total relations are kilobytes. Two column-pruned scans of the
input; the bounded candidate summary stays cluster-side behind an eager
``localCheckpoint`` (freed with the result's lineage — no session-lifetime
persist leak, and no multi-million-row driver collect at the 100k-partition
worst case).

Arrow-batched ``value_counts`` does the local pruning vectorized — the
per-partition distinct set is bounded by the partition size
(``spark.sql.files.maxPartitionBytes``), not the global universe.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CAND_SCHEMA = "value string, local_n bigint, part_rows bigint"


def _local_prune(k: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        total = 0
        for b in batches:
            total += len(b)
            for v, c in b["value"].value_counts().items():
                counts[v] = counts.get(v, 0) + int(c)
        survivors = {v: c for v, c in counts.items() if c * k > total}
        yield pd.DataFrame(
            {
                "value": list(survivors) + [None],
                "local_n": list(survivors.values()) + [0],
                "part_rows": [0] * len(survivors) + [total],
            }
        )

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
    # The candidate summary is bounded-small BY CONSTRUCTION (< k survivor
    # rows + 1 total row per partition), but at the worst case (k=100, 100k
    # partitions) that is still ~10M rows — too many to round-trip through
    # the driver. localCheckpoint(eager=True) materializes it once in
    # executor storage with truncated lineage; both consumers (the scalar
    # total and the candidate set) read the checkpoint, so the candidate
    # pass runs exactly once and only ONE NUMBER ever reaches the driver.
    # The checkpoint blocks are freed when the RDD is GC'd at function exit
    # — no session-lifetime persist leak.
    summary = vals.mapInPandas(_local_prune(k), _CAND_SCHEMA).localCheckpoint(
        eager=True
    )
    total_n = summary.agg(F.sum("part_rows")).collect()[0][0] or 0
    cand = summary.where(F.col("value").isNotNull()).select("value").distinct()
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
