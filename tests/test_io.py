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
