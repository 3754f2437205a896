"""Scalable sequence packing (concat-then-chunk running token offsets).

A running sum per language with ``Window.partitionBy(lang)`` has the same
scale cliff as single-window top-k (see operators/topk.py): ~10 distinct
languages over 100 TB means 10 straggler tasks, each cum-summing terabytes.
Unlike top-k, a running sum is NOT salt-decomposable — it needs contiguous
chunks of the global order — so the fix is range-chunking, not salting:

    1. the per-lang order is (h, doc_id) where ``h = md5(text)``; a fixed
       hex PREFIX of ``h`` therefore defines contiguous, deterministic,
       uniformly-sized ranges of that order (no repartitionByRange
       sampling, no spark_partition_id — both are nondeterministic across
       plan branches),
    2. pass 1: aggregate per-(lang, chunk) token sums (map-side combined,
       tiny output: n_langs × 16^prefix rows), then an exclusive prefix
       sum per lang over that TINY aggregate gives each chunk's global
       starting offset,
    3. pass 2: running sum windowed over (lang, chunk) — n_langs × n_chunks
       parallel partitions — plus the broadcast-joined chunk offset equals
       the single-window global running sum exactly.

Result is bit-identical to the one-window plan (global exclusive cumsum =
chunk offset + chunk-local exclusive cumsum) and every stage is either a
narrow map, a combined aggregate, a window over (lang, chunk), or a
broadcast join. No driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunked_running_offset(
    df: DataFrame,
    part_col: str,
    hash_col: str,
    id_col: str,
    value_col: str,
    out_col: str = "offset",
    prefix_chars: int = 2,
) -> DataFrame:
    """Exclusive running sum of ``value_col`` per ``part_col``, ordered by
    (``hash_col``, ``id_col``), parallelized over 16**prefix_chars
    contiguous chunks of the hash order. ``hash_col`` must be a lowercase
    hex string (e.g. md5) so its prefix is both uniform and order-aligned.

    Exactly equivalent to
    ``sum(value) OVER (PARTITION BY part ORDER BY hash, id) - value``.
    """
    chunk = F.conv(F.substring(F.col(hash_col), 1, prefix_chars), 16, 10).cast("int")
    base = df.withColumn("_chunk", chunk)

    # pass 1: tiny per-(part, chunk) sums → exclusive per-part chunk offsets
    part_sums = base.groupBy(part_col, "_chunk").agg(
        F.sum(value_col).alias("_chunk_tot")
    )
    w_off = (
        Window.partitionBy(part_col)
        .orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = part_sums.select(
        part_col,
        "_chunk",
        F.coalesce(F.sum("_chunk_tot").over(w_off), F.lit(0)).alias("_chunk_off"),
    )

    # pass 2: chunk-local exclusive running sum + broadcast chunk offset
    w_local = (
        Window.partitionBy(part_col, "_chunk")
        .orderBy(hash_col, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn(
        "_local_cum", F.sum(value_col).over(w_local) - F.col(value_col)
    )
    # NULL-safe rejoin: a NULL part value is a legitimate window
    # partition (PARTITION BY keeps it), so the offset join must not
    # drop it the way plain equality would. EqualNullSafe is still a
    # hash-join key, so the broadcast plan shape is unchanged. Caught
    # by the degenerate-docs net's NULL-source/lang rows.
    off = offsets.select(
        F.col(part_col).alias("_off_part"),
        F.col("_chunk").alias("_off_chunk"),
        "_chunk_off",
    )
    return (
        local.join(
            F.broadcast(off),
            F.col(part_col).eqNullSafe(F.col("_off_part"))
            & (F.col("_chunk") == F.col("_off_chunk")),
        )
        .withColumn(out_col, F.col("_chunk_off") + F.col("_local_cum"))
        .drop("_off_part", "_off_chunk", "_chunk", "_chunk_off", "_local_cum")
    )
