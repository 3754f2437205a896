"""Input-layout parallelism guard (r18 optimization).

The bench corpus ships each table as ONE parquet file with ONE row
group, so every scan is a single task no matter how the split configs
are set (a row group is indivisible). Pipelines whose cost is per-row
compute fused into the scan stage — tokenize + shingle + hash over the
documents corpus, vector folds over the embeddings corpus — therefore
ran on one core of 32 at sf0.1 (measured: the dedup_jaccard_pairs
shingle stage was a single 3.6s task).

``spread_scan`` is the guide §2.5 remedy ("one huge unsplittable file …
repartition immediately after the read"), made scale-adaptive: it
round-robins the rows to the session's default parallelism ONLY when
the frame's actual scan layout is below it. On a production layout
(many files / many row groups) the condition is false and the call is
an exact no-op — no extra exchange at 100 TB; the cost exists only on
degenerate layouts, where it is one corpus-linear shuffle that unlocks
every core for the downstream per-row work.

Call it AFTER any scan-pushable filters (a repartition would otherwise
block predicate pushdown) and BEFORE the heavy per-row compute.

Intended for scan-adjacent or checkpoint-leaf frames only (its call
sites): ``df.rdd.getNumPartitions()`` compiles the physical plan on
each call and, on shuffle-fed inputs, reports the static pre-AQE
shuffle partition count rather than the runtime-coalesced one — the
guard would then be conservative (silent no-op) rather than wrong, but
the probe cost is only justified next to a leaf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` to the session's default parallelism iff its
    current layout has fewer partitions (single-file/single-row-group
    inputs); exact no-op on healthy layouts. Row placement only —
    results are unaffected."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
