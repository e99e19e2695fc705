"""Multimodal column tests: oracle parity for metadata math, exact pure-
Python verification of the mapInPandas decode/frame-sample paths, and the
stubbed real-decode contract."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators import (
    multimodal as M,
)
from tests.conftest import SF_DIR, assert_matches_oracle

ORACLE_QUERIES = ["mm_metadata_summary", "mm_frame_inventory", "mm_frame_dedup"]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert_matches_oracle(qs[name](spark, SF_DIR), oracles[name], SF_DIR)


def _payloads():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, encode(text) FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    return {doc_id: bytes(payload) for doc_id, payload in rows}


def test_byte_features_exact(spark):
    """mapInPandas featurizer matches a from-scratch pure-Python computation
    byte for byte."""
    expected = {}
    for doc_id, b in _payloads().items():
        hist = [0, 0, 0, 0]
        for byte in b:
            hist[byte >> 6] += 1
        expected[doc_id] = (len(b), sum(b), *hist)
    got = {
        r["doc_id"]: (r["n_bytes"], r["sum_bytes"], r["hist_0"], r["hist_1"], r["hist_2"], r["hist_3"])
        for r in entrymod.queries()["mm_byte_features"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_frame_sample_exact(spark):
    expected = {}
    for doc_id, b in _payloads().items():
        n_frames = -(-len(b) // M.FRAME_SIZE)
        for idx in range(0, n_frames, M.FRAME_STRIDE):
            frame = b[idx * M.FRAME_SIZE : (idx + 1) * M.FRAME_SIZE]
            expected[(doc_id, idx)] = (len(frame), sum(frame))
    got = {
        (r["doc_id"], r["frame_idx"]): (r["frame_bytes"], r["frame_sum"])
        for r in entrymod.queries()["mm_frame_sample"](spark, SF_DIR).collect()
    }
    assert got == expected
    assert len(got) > 0


def test_frame_sample_consistent_with_inventory(spark):
    """The sampler emits exactly as many frames per asset as the (oracle-
    checked) inventory query plans."""
    from pyspark.sql import functions as F

    qs = entrymod.queries()
    sampled = (
        qs["mm_frame_sample"](spark, SF_DIR).groupBy("doc_id").agg(F.count("*").alias("actual"))
    )
    inv = qs["mm_frame_inventory"](spark, SF_DIR).select("doc_id", "n_sampled")
    joined = inv.join(sampled, "doc_id", "left").fillna(0, ["actual"])
    assert joined.filter("n_sampled != actual").count() == 0


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        M.decode_image_real(b"\x89PNG")


def test_frame_dedup_doubled_corpus_properties(spark):
    """Every frame appears at least twice (the corpus is doubled), the
    canonical owner is always an un-shifted doc, and copy counts are even
    unless a frame also repeats within the original corpus."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    out = entrymod.queries()["mm_frame_dedup"](spark, SF_DIR).cache()
    assert out.where(F.col("n_copies") < 2).count() == 0
    assert out.where(F.col("canon_doc_id") >= 1_000_000).count() == 0
    # total frame instances reconcile: sum of copies == 2 × original frames
    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.sources.tables import (
        load_table,
    )
    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators.multimodal import (
        FRAME_SIZE,
    )

    docs = load_table(spark, SF_DIR, "documents")
    nb = F.length(F.encode(F.col("text"), "UTF-8"))
    n_frames = docs.select(
        F.sum(F.floor((nb + F.lit(FRAME_SIZE - 1)) / F.lit(FRAME_SIZE))).alias("n")
    ).collect()[0]["n"]
    total_copies = out.agg(F.sum("n_copies")).collect()[0][0]
    assert total_copies == 2 * n_frames
    out.unpersist()
