"""Parquet table catalog for the driver-generated TPC-H-ish testdata.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet per table under
``/root/testdata/sf{0.001,0.01,0.1}``.

Reading goes through ``spark.read.parquet`` so Catalyst gets predicate
pushdown + column pruning for free; never hand-roll a scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at any scale factor (region and
# nation are fixed-cardinality in TPC-H; supplier/part/customer grow with sf
# but stay broadcastable at the sfs used here — joins take an explicit
# broadcast() only for the fixed-cardinality ones).
BROADCAST_SAFE: frozenset[str] = frozenset({"region", "nation"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ts as INT64 TIMESTAMP(NANOS), which the Spark
    parquet reader rejects outright. Read nanos as long and truncate to
    microseconds — exactly what DuckDB's nanos→micros read does, so the
    oracle sees identical instants."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as STypes

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    if isinstance(df.schema["ts"].dataType, STypes.LongType):
        # `ts / 1000` would go through DOUBLE (53-bit mantissa) and corrupt
        # nano-epoch values (~2^60); `div` is exact integer division.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view so ``spark.sql`` can address it."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
