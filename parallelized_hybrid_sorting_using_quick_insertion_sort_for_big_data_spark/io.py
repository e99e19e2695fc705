"""Ordered sinks — the engine's counterpart of the reference's output paths.

The reference has two sinks (SURVEY.md §2a #14/#15): an ordered stdout print
and a one-int-per-line ``sorted.txt`` file (QuickInsertionHeap.cu:118-131).
Spark-first equivalents:

- ``show_ordered``   — bounded preview (never prints 100 TB to a terminal).
- ``write_sorted``   — partitioned parquet/csv/text where the GLOBAL order is
  preserved by range partitioning: file i's keys all precede file i+1's
  (Spark writes one file per partition, partitions are range-ordered after
  ``orderBy``). This is the 100 TB-correct "sorted file" — a manifest of
  range-ordered parts, not one giant file.
- ``write_sorted_single`` — the literal single-file ``sorted.txt`` analogue
  (coalesce(1)); only for small outputs, flagged accordingly.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .operators.sorting import total_sort


def show_ordered(df: DataFrame, keys: Iterable[str | Column], n: int = 20) -> None:
    """Preview the first n rows in global key order (reference's stdout sink,
    bounded — uses the top-k plan, not a full sort)."""
    df.orderBy(*[F.col(k) if isinstance(k, str) else k for k in keys]).show(n)


def write_sorted(
    df: DataFrame,
    path: str,
    keys: Iterable[str | Column],
    fmt: str = "parquet",
    mode: str = "overwrite",
    ascending: bool | Iterable[bool] = True,
) -> None:
    """Write globally sorted output as range-ordered part files.

    ``orderBy`` plans a range exchange, so part-00000 holds the smallest
    keys, part-00001 the next range, etc.; concatenating parts in filename
    order reproduces the total order — the distributed ``sorted.txt``."""
    out = total_sort(df, keys, ascending)
    out.write.mode(mode).format(fmt).save(path)


def write_sorted_single(
    df: DataFrame,
    path: str,
    keys: Iterable[str | Column],
    fmt: str = "text",
    mode: str = "overwrite",
) -> None:
    """One-file ordered sink mirroring writeArrayToFile
    (QuickInsertionHeap.cu:118-131). Single-task write — small outputs only
    (top-k results, aggregates); at scale use ``write_sorted``."""
    out = total_sort(df, keys)
    if fmt == "text":
        cols = [c for c in out.columns]
        out = out.select(F.concat_ws("\t", *[F.col(c).cast("string") for c in cols]).alias("value"))
    out.coalesce(1).write.mode(mode).format(fmt).save(path)


# ---------------------------------------------------------------------------
# Multi-format sources/sinks (the reference has exactly one format: ints in
# a text file, QuickInsertionHeap.cu:118-131; an engine needs the standard
# lake formats, schema-explicit both ways)
# ---------------------------------------------------------------------------

_FORMATS = ("parquet", "orc", "csv", "json")


def write_table(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite") -> None:
    """Format-dispatched sink. CSV keeps a header for self-description;
    timestamps serialize as ISO-8601 micros in UTC (session tz) for both
    text formats, so a round-trip is lossless to the microsecond."""
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}")
    w = df.write.mode(mode)
    if fmt == "csv":
        w = w.option("header", "true").option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    if fmt == "json":
        w = w.option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    w.format(fmt).save(path)


def read_table(spark, path: str, fmt: str = "parquet", schema=None) -> DataFrame:
    """Format-dispatched source. For CSV/JSON an explicit schema is
    REQUIRED at scale: schema inference reads the data twice and infers
    per-file — never acceptable on a 100 TB lake (parquet carries its own
    schema)."""
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}")
    r = spark.read
    if fmt == "parquet":
        return r.parquet(path)
    if fmt == "orc":
        # self-describing columnar like parquet; no schema needed
        return r.orc(path)
    if schema is None:
        raise ValueError(f"{fmt} requires an explicit schema (inference double-scans)")
    r = r.schema(schema)
    if fmt == "csv":
        r = r.option("header", "true").option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    else:
        r = r.option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    return r.format(fmt).load(path)


def compact(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> int:
    """Small-files compaction (r08): rewrite a dataset directory into
    ~``target_file_bytes`` files. The small-files problem is the chronic
    100 TB lake disease — a streaming sink or an over-parallel write
    leaves thousands of KB-sized files, and every later scan pays a task
    + a footer read + an open/close per file; compaction is the
    standing maintenance job that fixes it.

    Sizing uses the SOURCE's on-disk bytes (driver-side filesystem
    metadata via Spark's Hadoop FS — no data read): n_files =
    clamp(ceil(total_bytes / target), 1, current_file_count). The
    rewrite is one round-robin ``repartition(n)`` — an explicit full
    shuffle, which is the honest cost of re-laying-out data; for a
    sorted/z-ordered dataset use the sorted writers instead (this
    function is for UNordered layout where only file count matters).
    Returns the file count written."""
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}")
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = p.getFileSystem(hconf)
    total = 0
    n_src = 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue  # _SUCCESS, checksums, hidden metadata
        total += f.getLen()
        n_src += 1
    if n_src == 0:
        raise ValueError(f"no data files under {src_path!r}")
    n_out = max(1, min(n_src, -(-total // target_file_bytes)))
    df = read_table(spark, src_path, fmt)
    write_table(df.repartition(n_out), dst_path, fmt)
    out_files = [
        s.getPath().getName()
        for s in fs.listStatus(jvm.org.apache.hadoop.fs.Path(dst_path))
    ]
    return sum(1 for n in out_files if not (n.startswith("_") or n.startswith(".")))
