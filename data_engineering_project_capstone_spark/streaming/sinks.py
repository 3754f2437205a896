"""Streaming sinks beyond the test-harness memory sink.

Two production shapes:

- :func:`start_parquet_sink` — the stock file sink. Exactly-once by
  construction: the checkpoint's WAL + the file-sink manifest
  (``_spark_metadata``) commit atomically per micro-batch, so a restart
  from the same checkpoint never re-emits a committed batch and readers
  that honor the manifest never see partial output.
- :func:`start_foreach_batch_sink` — ``foreachBatch`` for targets with no
  native streaming sink (JDBC, upserts, multi-table fan-out). Delivery is
  at-least-once PER BATCH (a batch can re-run after a crash mid-sink), so
  the writer fn receives ``(df, batch_id)`` and MUST be idempotent on
  batch_id — the helper ships an idempotent parquet-partition writer as
  the reference implementation: each batch overwrites its own
  ``batch_id=N`` partition, so a re-run replaces rather than duplicates.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def start_parquet_sink(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> StreamingQuery:
    """File sink + checkpoint: the durable, exactly-once pipeline tail."""
    return (
        stream_df.writeStream.outputMode(output_mode)
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def idempotent_parquet_batch_writer(out_dir: str) -> Callable[[DataFrame, int], None]:
    """Reference idempotent ``foreachBatch`` writer: dynamic-overwrite of
    the batch's own partition — re-delivery of a batch replaces its output
    instead of appending a duplicate."""
    from pyspark.sql import functions as F

    def write(df: DataFrame, batch_id: int) -> None:
        (
            df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    return write


def start_foreach_batch_sink(
    stream_df: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    output_mode: str = "append",
) -> StreamingQuery:
    """``foreachBatch`` sink with checkpointing; ``batch_fn`` must be
    idempotent on batch_id (see :func:`idempotent_parquet_batch_writer`)."""
    return (
        stream_df.writeStream.outputMode(output_mode)
        .foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
