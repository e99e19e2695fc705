"""Synchronous drain of a streaming DataFrame through ``foreachBatch`` →
parquet — the scale-safe replacement for the ``memory`` sink in the demo
runners.

A ``memory`` sink materializes every micro-batch's output in DRIVER memory;
fine for a notebook, a bottleneck the moment update history exceeds the
driver heap. ``foreachBatch`` writes each micro-batch distributed,
executor-side, straight to parquet: the driver only coordinates, and any
post-hoc reduction (e.g. last-update-per-key) runs as a distributed read of
the sink directory. This is also the production topology — the same
callback targets object storage / a warehouse table unchanged.

Sink directories live under the session temp dir and are removed at
process exit (the returned DataFrame stays readable for the session's
lifetime); checkpoints and staged sources are removed as soon as the
stream stops.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

#: Shuffle-partition count the demo stream runners use while their query is
#: live. Each stateful exchange materializes ONE state-store instance and
#: one sink file per shuffle partition per trigger — at 32 partitions a
#: 3-trigger demo pays 96 store commits + 96 parquet footers of pure
#: overhead. 8 keeps the demos honest locally; a production job sizes this
#: to its key cardinality/throughput, not to the core count.
STREAM_SHUFFLE_PARTITIONS = 8


@contextmanager
def stream_shuffle_partitions(spark: SparkSession, n: int = STREAM_SHUFFLE_PARTITIONS):
    """Scoped ``spark.sql.shuffle.partitions`` override for a streaming
    run (the value is latched into the query's state layout at checkpoint
    creation; restoring it after the stream stops leaves batch queries on
    the session default)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _scratch_dir(name: str) -> str:
    path = os.path.join(tempfile.gettempdir(), name)
    os.makedirs(path, exist_ok=True)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def drain_stream_to_parquet(
    stream_df: DataFrame,
    name: str,
    output_mode: str = "update",
    overwrite_each_batch: bool = False,
) -> str:
    """Start ``stream_df``, process everything available, stop. Each
    micro-batch is written by the executors to a parquet sink dir
    (append for update-mode deltas; overwrite when each batch carries the
    complete result). Returns the sink directory path."""
    out_dir = _scratch_dir(name + "_out")
    checkpoint = os.path.join(tempfile.gettempdir(), name + "_ckpt")
    write_mode = "overwrite" if overwrite_each_batch else "append"

    def _write_batch(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode(write_mode).parquet(out_dir)

    q = (
        stream_df.writeStream.outputMode(output_mode)
        .foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        shutil.rmtree(checkpoint, ignore_errors=True)
    return out_dir


def read_sink(spark: SparkSession, out_dir: str, schema) -> DataFrame:
    """Read a drained sink dir; an empty dir (stream emitted nothing) reads
    as an empty frame with the declared schema."""
    if any(f.endswith(".parquet") for f in os.listdir(out_dir)):
        return spark.read.parquet(out_dir)
    return spark.createDataFrame([], schema)
