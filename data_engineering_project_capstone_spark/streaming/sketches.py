"""Streaming count-min sketch maintenance — the mergeable-sketch pattern
applied to Structured Streaming.

A CMS is a grid of counters closed under cell-wise addition, so the
exactly-once way to maintain one over a stream is NOT to mutate shared
state per batch (re-delivered batches would double-count) but to write
each micro-batch's cell DELTAS to a partition keyed by batch_id with
dynamic overwrite — re-delivery replaces the partition instead of
adding to it (same idempotence contract as
:func:`sinks.idempotent_parquet_batch_writer`). The "current sketch" is
then a read-time merge: sum cells across all batch partitions. That
merge is associative and commutative, so it is also how shard-local
sketches combine on a cluster — the batch entry ``sketch_cms_topk``
(plans/catalog_r6c.py) and this maintainer share the md5 bucketing and
therefore produce bit-identical cells for the same data.

At 100 TB / long-running streams, compact old batch partitions by
re-summing them into a single partition (the merge is the same
cell-wise sum); estimates never degrade because addition is exact.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.scalar import md5_bucket

CMS_D = 4
CMS_W = 256


def cms_cells(df: DataFrame, item_col: str) -> DataFrame:
    """CMS cell deltas (d, bucket, cell) for the given items — one row
    per non-empty cell. Null items are dropped (a null has no identity
    to count). Map-side combined: the groupBy is over ≤ D×W groups."""
    items = df.select(F.col(item_col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
    keyed = items.select(
        "item",
        F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("d"),
    ).withColumn("bucket", md5_bucket(F.col("item"), F.col("d"), CMS_W))
    return keyed.groupBy("d", "bucket").agg(F.count("*").alias("cell"))


def cms_batch_writer(out_dir: str, item_col: str) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` function: write this batch's cell deltas under
    its own batch_id partition, dynamic-overwrite so re-delivery of the
    same batch replaces rather than double-counts."""

    def write(df: DataFrame, batch_id: int) -> None:
        (
            cms_cells(df, item_col)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    return write


def start_cms_sink(
    stream_df: DataFrame,
    item_col: str,
    out_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Maintain a CMS over a stream: per-batch cell deltas to
    ``out_dir``, exactly-once via checkpoint + batch_id overwrite."""
    return (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(cms_batch_writer(out_dir, item_col))
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_cms(spark: SparkSession, out_dir: str) -> DataFrame:
    """The merged sketch: cell-wise sum across all batch partitions."""
    return (
        spark.read.parquet(out_dir)
        .groupBy("d", "bucket")
        .agg(F.sum("cell").alias("cell"))
    )


def cms_estimate(sketch: DataFrame, items: DataFrame, item_col: str) -> DataFrame:
    """Point estimates for the given items: min over the D rows of the
    sketch. The sketch is broadcast (≤ D×W rows); estimating is
    map-side. Items absent from every cell estimate as the cell floor,
    never NULL — CMS overestimates, it cannot miss."""
    keyed = (
        items.select(F.col(item_col).cast("string").alias("item"))
        .distinct()
        .select(
            "item",
            F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("d"),
        )
        .withColumn("bucket", md5_bucket(F.col("item"), F.col("d"), CMS_W))
    )
    return (
        keyed.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cell"), F.lit(0))).alias("est"))
    )
