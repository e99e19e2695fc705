"""Deterministic seeded integer sources mirroring the reference generators.

The reference fills its array from C ``rand()`` with three distributions
(SURVEY.md §2a #1; /root/reference/QuickInsertionHeap.c:183-186,
quickThreshold.c:165-168, SequentialQuickInsert.c:66-70,
QuickInsertionHeap.cu:142-145):

  A: ``((long long)rand() * rand()) % 5000000``  (seed time-based)
  B: ``rand() % 1000000``                        (fixed seed 42)
  C: ``rand() % 5000000``                        (seed time-based)

We do NOT replicate glibc ``rand()`` (SURVEY.md §7.4): instead every
distribution is a pure arithmetic function of the row id, so the exact same
expression is computable by Spark (JVM, codegen) and by the DuckDB oracle —
deterministic, engine-independent, shardable to any partition count. This is
stronger reproducibility than the reference's seed-42 variant.

The mix function is a 64-bit splitmix64-style finalizer expressed with
unsigned-free arithmetic. Spark and DuckDB both evaluate it on BIGINT, so we
keep every intermediate within int64 by masking multiplications down to
32-bit chunks; to stay SIMPLE and portable we instead use a multiplicative
Weyl sequence `(id * K + seed) mod m` with a large odd constant — plenty of
dispersion for sort benchmarks and trivially identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Knuth's multiplicative-hash constant (2^32 * golden ratio), odd.
MIX_CONST = 2654435761

DIST_A_MOD = 5_000_000  # QuickInsertionHeap.c:184
DIST_B_MOD = 1_000_000  # quickThreshold.c:167
DIST_C_MOD = 5_000_000  # QuickInsertionHeap.cu:144


def mixed_value(id_col: Column, modulus: int, seed: int = 42) -> Column:
    """`(id * MIX_CONST + seed) % modulus` — all-BIGINT, engine-portable."""
    return ((id_col * F.lit(MIX_CONST) + F.lit(seed)) % F.lit(modulus)).alias("value")


def mixed_value_sql(id_expr: str, modulus: int, seed: int = 42) -> str:
    """The identical expression as ANSI SQL for the DuckDB oracle."""
    return f"(({id_expr} * {MIX_CONST} + {seed}) % {modulus})"


def seeded_ints(
    spark: SparkSession,
    n: int,
    modulus: int = DIST_B_MOD,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """N pseudo-random ints as a DataFrame ``(id BIGINT, value BIGINT)``.

    ``spark.range`` generates partition-local id ranges with no shuffle and
    no driver materialization — the 100 TB-safe analogue of the reference's
    rank-0 ``malloc`` + scatter (QuickInsertionHeap.c:181-203): data is born
    distributed instead of being born on the driver and shipped out.
    """
    rng = spark.range(0, n, 1, num_partitions) if num_partitions else spark.range(n)
    return rng.select(F.col("id"), mixed_value(F.col("id"), modulus, seed))


def seeded_ints_sql(n: int, modulus: int = DIST_B_MOD, seed: int = 42) -> str:
    """DuckDB-runnable oracle producing the identical (id, value) relation."""
    return (
        f"SELECT i AS id, {mixed_value_sql('i', modulus, seed)} AS value "
        f"FROM range({n}) t(i)"
    )
