"""Benchmark-decontamination queries over `documents` (extension layer).

The testdata has no real benchmark leakage, so the query PLANTS it: the
corpus is documents ∪ truncated copies of the benchmark subset (each copy =
the bench doc's first 120 chars plus a unique suffix token, simulating a
partially-leaked eval question). The benchmark side is the `doc_id % 37`
subset. Planted copies score high contamination, organic docs near zero —
the operator is exercised on true positives AND true negatives, and the
whole computation (n-gram construction, broadcast membership join, per-doc
aggregation) is replayed verbatim by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import decontam
from ..queries import query
from ..sources.tables import load_table

_N = 5
_THRESH = 0.2
_PLANT_SHIFT = 2_000_000
_PLANT_CHARS = 120

_CORPUS_SQL = f"""
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_PLANT_SHIFT} AS doc_id,
         concat(substr(text, 1, {_PLANT_CHARS}), ' zzq', CAST(doc_id AS VARCHAR)) AS text
  FROM documents WHERE doc_id % 37 = 0
"""
_BENCH_SQL = "SELECT doc_id, text FROM documents WHERE doc_id % 37 = 0"

_DECONTAM_ORACLE = decontam.contamination_stats_sql(
    _CORPUS_SQL, _BENCH_SQL, n=_N, threshold=_THRESH
)


def _corpus_and_bench(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.where(F.col("doc_id") % 37 == 0)
    planted = bench.select(
        (F.col("doc_id") + _PLANT_SHIFT).alias("doc_id"),
        F.concat(
            F.substring(F.col("text"), 1, _PLANT_CHARS),
            F.lit(" zzq"),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    return docs.unionByName(planted), bench


@query("decontam_ngram_overlap", sql=_DECONTAM_ORACLE)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document benchmark contamination: distinct word 5-gram overlap
    against the broadcast benchmark gram set. Portable raw-gram join here
    (oracle replays it); production flips ``hash_grams=True`` for 8-byte
    join keys — same topology, same verdicts."""
    corpus, bench = _corpus_and_bench(spark, sf_dir)
    return decontam.contamination_stats(
        corpus, bench, n=_N, threshold=_THRESH, hash_grams=False
    )
