"""Multimodal column support (extension layer, SURVEY §2c).

The reference has no notion of media data (its sole type is a flat int array,
SequentialQuickInsert.c:60 — SURVEY §1.1); a 100 TB training-data pipeline
needs image/audio/video columns. The model here is the one every lakehouse
uses: an **opaque ``binary`` payload column next to a typed metadata struct**,
stored columnar so metadata-only queries never touch the payload bytes
(parquet column pruning drops the heavy column at the scan).

Because this container has no image/audio codecs, the *real* pixel decode is
a clearly-marked stub (:func:`decode_image_real`). Everything around it — the
schema, the Arrow-batched ``mapInPandas`` plumbing, the frame segmentation
math, the partition sizing — is real and tested, and a production deployment
swaps one function.

100 TB notes:
- every operator here is narrow (per-row map): no shuffle anywhere;
- payload work runs in ``mapInPandas`` (Arrow batches, zero-copy bytes into
  Python) — never row-at-a-time UDFs;
- metadata queries (`n_bytes`, frame counts) compile to JVM expressions over
  pruned columns; the binary column is never read unless a decode is asked;
- keep `spark.sql.files.maxPartitionBytes` at default 128 MB: payload rows
  are large, so a scan partition holds few rows and Arrow batches stay small.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Fake "video" layout: fixed-size frames carved out of the payload byte
# stream, every STRIDE-th frame sampled. Deterministic, codec-free, and the
# frame *count* math is plain integer arithmetic (oracle-expressible).
FRAME_SIZE = 64
FRAME_STRIDE = 4

#: Metadata struct stored next to every payload (typed, queryable without
#: touching the bytes).
META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("frame_size", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
    ]
)


def format_from_source(source: Column) -> Column:
    """Deterministic media format tag derived from the document source — the
    stand-in for a real pipeline's MIME sniffing."""
    return (
        F.when(source == "web", F.lit("image/png"))
        .when(source == "books", F.lit("audio/wav"))
        .when(source == "code", F.lit("text/plain"))
        .otherwise(F.lit("video/raw"))
    )


def attach_payload(documents: DataFrame) -> DataFrame:
    """documents → (doc_id, payload binary, meta struct).

    The payload is the UTF-8 encoding of the text column — a deterministic
    opaque byte blob (in production this column arrives from object storage;
    here it must be derivable from the read-only testdata). All expressions
    are JVM-side; nothing leaves whole-stage codegen.
    """
    payload = F.encode(F.col("text"), "UTF-8")
    n_bytes = F.octet_length(payload).cast("long")
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            format_from_source(F.col("source")).alias("format"),
            n_bytes.alias("n_bytes"),
            F.lit(FRAME_SIZE).alias("frame_size"),
            # ceil(n_bytes / FRAME_SIZE) in pure integer math — identical on
            # the DuckDB oracle side, no float division anywhere
            F.expr(f"(octet_length(encode(text, 'UTF-8')) + {FRAME_SIZE - 1}) div {FRAME_SIZE}")
            .cast("long")
            .alias("n_frames"),
        ).alias("meta"),
    )


def decode_image_real(payload: bytes) -> object:
    """THE pluggable real-decode slot. A deployment with codecs installed
    replaces this body with e.g. ``PIL.Image.open(io.BytesIO(payload))``;
    this container has no image/audio libraries, so calling it raises."""
    raise NotImplementedError(
        "real media decode requires an image/audio codec library, which is "
        "not installed in this environment; byte_features()/sample_frames() "
        "exercise the identical Spark plumbing with a deterministic fake"
    )


_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sum_bytes", T.LongType()),
        T.StructField("hist_0", T.LongType()),  # byte value in [0, 64)
        T.StructField("hist_1", T.LongType()),  # [64, 128)
        T.StructField("hist_2", T.LongType()),  # [128, 192)
        T.StructField("hist_3", T.LongType()),  # [192, 256)
    ]
)


def byte_features(with_payload: DataFrame) -> DataFrame:
    """Deterministic fake of 'decode + feature-extract': per payload, byte
    count, exact byte sum, and a 4-bin byte histogram. Integer outputs only,
    so any re-implementation (the pytest pure-Python oracle) matches exactly.

    Plumbing is the real thing: ``mapInPandas`` streams Arrow record batches
    into Python; bytes arrive zero-copy; output is a new Arrow batch. This is
    the exact signature a real decoder (``decode_image_real``) plugs into.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(b >> 6, minlength=4)
                out.append(
                    (
                        doc_id,
                        int(b.size),
                        int(b.sum(dtype="int64")),
                        int(hist[0]),
                        int(hist[1]),
                        int(hist[2]),
                        int(hist[3]),
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in _FEATURES_SCHEMA.fields])

    return with_payload.select("doc_id", "payload").mapInPandas(_extract, _FEATURES_SCHEMA)


_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("frame_sum", T.LongType()),
    ]
)


def sample_frames(
    with_payload: DataFrame, frame_size: int = FRAME_SIZE, stride: int = FRAME_STRIDE
) -> DataFrame:
    """Frame-sample the fake video: carve the payload into ``frame_size``-byte
    frames (last frame ragged) and emit every ``stride``-th frame with its
    exact byte sum. One input row fans out to ceil(n_bytes/frame_size)/stride
    output rows — ``mapInPandas`` handles 1→N natively (unlike scalar UDFs).
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(payload, dtype=np.uint8)
                for idx in range(0, -(-b.size // frame_size), stride):
                    frame = b[idx * frame_size : (idx + 1) * frame_size]
                    out.append((doc_id, idx, int(frame.size), int(frame.sum(dtype="int64"))))
            yield pd.DataFrame(out, columns=[f.name for f in _FRAMES_SCHEMA.fields])

    return with_payload.select("doc_id", "payload").mapInPandas(_sample, _FRAMES_SCHEMA)
