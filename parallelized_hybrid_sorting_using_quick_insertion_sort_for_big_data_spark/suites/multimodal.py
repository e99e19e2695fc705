"""Multimodal-column queries (extension layer, SURVEY §2c): opaque binary
payloads + typed metadata over `documents`, with metadata math oracle-checked
in DuckDB and the mapInPandas decode paths pytest-verified against a pure-
Python reimplementation (rows-only for the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as M
from ..queries import query
from ..sources.tables import load_table

_FMT_CASE = """
CASE source WHEN 'web' THEN 'image/png'
            WHEN 'books' THEN 'audio/wav'
            WHEN 'code' THEN 'text/plain'
            ELSE 'video/raw' END
"""

# ---------------------------------------------------------------------------
# 1. Metadata-only summary: never touches payload bytes (column pruning)
# ---------------------------------------------------------------------------

_METADATA_ORACLE = f"""
SELECT {_FMT_CASE} AS format,
       count(*) AS n_assets,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       max(octet_length(encode(text))) AS max_bytes,
       CAST(sum((octet_length(encode(text)) + {M.FRAME_SIZE - 1}) // {M.FRAME_SIZE}) AS BIGINT) AS total_frames
FROM documents
GROUP BY 1
"""


@query("mm_metadata_summary", sql=_METADATA_ORACLE)
def mm_metadata_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate typed metadata per media format. The plan reads only the
    struct fields — at scale, parquet column pruning means the multi-TB
    payload column is never scanned for this query."""
    assets = M.attach_payload(load_table(spark, sf_dir, "documents"))
    return assets.groupBy(F.col("meta.format").alias("format")).agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.max("meta.n_bytes").alias("max_bytes"),
        F.sum("meta.n_frames").alias("total_frames"),
    )


# ---------------------------------------------------------------------------
# 2. Per-asset frame inventory: integer frame/sample math, oracle-exact
# ---------------------------------------------------------------------------

_INVENTORY_ORACLE = f"""
SELECT doc_id,
       {_FMT_CASE} AS format,
       octet_length(encode(text)) AS n_bytes,
       (octet_length(encode(text)) + {M.FRAME_SIZE - 1}) // {M.FRAME_SIZE} AS n_frames,
       ((octet_length(encode(text)) + {M.FRAME_SIZE - 1}) // {M.FRAME_SIZE}
        + {M.FRAME_STRIDE - 1}) // {M.FRAME_STRIDE} AS n_sampled
FROM documents
"""


@query("mm_frame_inventory", sql=_INVENTORY_ORACLE)
def mm_frame_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-asset frame segmentation plan: how many fixed-size frames the
    payload carves into and how many the every-Nth sampler will emit —
    the planning query a video pipeline runs before the expensive decode."""
    assets = M.attach_payload(load_table(spark, sf_dir, "documents"))
    return assets.select(
        "doc_id",
        F.col("meta.format").alias("format"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.n_frames").alias("n_frames"),
        F.expr(f"(meta.n_frames + {M.FRAME_STRIDE - 1}) div {M.FRAME_STRIDE}")
        .cast("long")
        .alias("n_sampled"),
    )


# ---------------------------------------------------------------------------
# 3. mapInPandas decode paths — oracle-checked per ROW: the deterministic
#    fake decode is integer byte math, which DuckDB can reproduce exactly by
#    hex-expanding the payload (hex(blob) → one row per byte via
#    generate_series → '0x'||pair cast). The decode path is therefore held
#    to the same value-hash bar as the relational queries, not rows-only.
# ---------------------------------------------------------------------------

# one row per payload byte: (doc_id, byte offset k, byte value 0-255)
_BYTES_CTE = """
b AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS nb
  FROM documents
),
u AS (
  SELECT doc_id,
         k,
         CAST('0x' || substr(hx, CAST(k * 2 + 1 AS INT), 2) AS INTEGER) AS byte
  FROM b, unnest(generate_series(0, nb - 1)) AS t(k)
)
"""

_BYTE_FEATURES_ORACLE = f"""
WITH {_BYTES_CTE},
agg AS (
  SELECT doc_id,
         CAST(sum(byte) AS BIGINT) AS sum_bytes,
         CAST(sum(CASE WHEN byte < 64 THEN 1 ELSE 0 END) AS BIGINT) AS hist_0,
         CAST(sum(CASE WHEN byte >= 64 AND byte < 128 THEN 1 ELSE 0 END) AS BIGINT) AS hist_1,
         CAST(sum(CASE WHEN byte >= 128 AND byte < 192 THEN 1 ELSE 0 END) AS BIGINT) AS hist_2,
         CAST(sum(CASE WHEN byte >= 192 THEN 1 ELSE 0 END) AS BIGINT) AS hist_3
  FROM u GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(b.nb AS BIGINT) AS n_bytes,
       COALESCE(agg.sum_bytes, 0) AS sum_bytes,
       COALESCE(agg.hist_0, 0) AS hist_0,
       COALESCE(agg.hist_1, 0) AS hist_1,
       COALESCE(agg.hist_2, 0) AS hist_2,
       COALESCE(agg.hist_3, 0) AS hist_3
FROM b LEFT JOIN agg USING (doc_id)
"""


@query("mm_byte_features", sql=_BYTE_FEATURES_ORACLE)
def mm_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched 'decode + featurize' over the binary payload column
    (deterministic fake decode; see operators.multimodal.decode_image_real
    for the clearly-stubbed real-codec slot). Oracle: DuckDB hex-expands
    the same payload to one row per byte and recomputes sum + histogram —
    an exact, engine-independent check on the whole decode path."""
    return M.byte_features(M.attach_payload(load_table(spark, sf_dir, "documents")))


_FRAME_SAMPLE_ORACLE = f"""
WITH {_BYTES_CTE},
f AS (
  SELECT doc_id,
         CAST(k // {M.FRAME_SIZE} AS BIGINT) AS frame_idx,
         CAST(count(*) AS BIGINT) AS frame_bytes,
         CAST(sum(byte) AS BIGINT) AS frame_sum
  FROM u
  GROUP BY doc_id, k // {M.FRAME_SIZE}
)
SELECT doc_id, frame_idx, frame_bytes, frame_sum
FROM f WHERE frame_idx % {M.FRAME_STRIDE} = 0
"""


@query("mm_frame_sample", sql=_FRAME_SAMPLE_ORACLE)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→N frame sampling over the binary payload column via mapInPandas.
    Oracle: the byte-expansion CTE grouped into frames, keeping every
    STRIDE-th frame — exact per-frame byte counts and sums."""
    return M.sample_frames(M.attach_payload(load_table(spark, sf_dir, "documents")))
