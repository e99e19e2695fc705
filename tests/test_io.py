"""Ordered-sink tests: the engine's counterparts of the reference's stdout
print and one-int-per-line sorted.txt (QuickInsertionHeap.cu:118-131) — but
distributed: range-ordered part files whose filename-order concatenation
reproduces the total order."""

from __future__ import annotations

import glob
import os

import pytest

from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark import io as eio
from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.sources import (
    datagen,
)
from tests.conftest import SF_DIR


@pytest.fixture()
def ints(spark):
    return datagen.seeded_ints(spark, 20_000, modulus=1_000_000, seed=42)


def test_write_sorted_parts_are_range_ordered(spark, ints, tmp_path):
    path = str(tmp_path / "sorted_parquet")
    # at 20k rows AQE coalesces the range exchange to one partition (correct
    # at this size); shrink the advisory size so the test sees the multi-file
    # shape a real dataset produces
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        eio.write_sorted(ints, path, ["value", "id"])
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    parts = sorted(glob.glob(os.path.join(path, "part-*")))
    assert len(parts) > 1, "expected a multi-file range-partitioned sink"
    # part i's max <= part i+1's min: filename order IS the total order
    prev_max = None
    total = 0
    for p in parts:
        rows = [r["value"] for r in spark.read.parquet(p).collect()]
        total += len(rows)
        assert rows == sorted(rows)
        if prev_max is not None and rows:
            assert prev_max <= rows[0]
        if rows:
            prev_max = rows[-1]
    assert total == 20_000


def test_write_sorted_single_text_is_fully_ordered(spark, ints, tmp_path):
    path = str(tmp_path / "sorted_txt")
    eio.write_sorted_single(ints.select("value"), path, ["value"])
    (txt,) = glob.glob(os.path.join(path, "part-*"))
    values = [int(line) for line in open(txt) if line.strip()]
    assert values == sorted(values)
    assert len(values) == 20_000


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_multiformat_roundtrip(spark, tmp_path, fmt):
    """orders (longs, strings, doubles, timestamp) survives a write+read
    round-trip losslessly in every supported format."""
    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.sources import (
        tables,
    )

    src = tables.load_table(spark, SF_DIR, "orders").limit(500)
    path = str(tmp_path / f"rt_{fmt}")
    eio.write_table(src, path, fmt)
    back = eio.read_table(spark, path, fmt, schema=src.schema)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_csv_without_schema_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        eio.read_table(spark, str(tmp_path), "csv")


def test_write_sorted_roundtrip_equals_orderBy(spark, ints, tmp_path):
    path = str(tmp_path / "rt")
    eio.write_sorted(ints, path, ["value", "id"])
    back = spark.read.parquet(path)
    assert back.count() == ints.count()
    got = {(r["id"], r["value"]) for r in back.collect()}
    want = {(r["id"], r["value"]) for r in ints.collect()}
    assert got == want


def test_compact_small_files(spark, tmp_path):
    """64 tiny files compact to the byte-sized target count with the exact
    same rows; the sizing probe is metadata-only (no read of the data)."""
    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark import io as eio

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    df.repartition(64).write.parquet(src)
    import os

    n_src = sum(1 for n in os.listdir(src) if n.endswith(".parquet"))
    assert n_src == 64
    total = sum(
        os.path.getsize(os.path.join(src, n))
        for n in os.listdir(src)
        if n.endswith(".parquet")
    )
    # target = half the total -> expect exactly 2 files
    n_out = eio.compact(spark, src, dst, target_file_bytes=(total + 1) // 2)
    assert n_out == 2
    assert sum(1 for n in os.listdir(dst) if n.endswith(".parquet")) == 2
    a = sorted(map(tuple, spark.read.parquet(dst).collect()))
    b = sorted(map(tuple, df.collect()))
    assert a == b
    # degenerate guards: huge target -> 1 file; tiny target never exceeds
    # the source file count
    assert eio.compact(spark, src, str(tmp_path / "c1"), 10**12) == 1
    assert eio.compact(spark, src, str(tmp_path / "c2"), 1) == 64
