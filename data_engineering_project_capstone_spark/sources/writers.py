"""Sink layer.

Replaces the reference's CSV-to-S3-to-Redshift-COPY handoff
(``dataprep.py:95,148,190,227-249``; ``sql_queries.py:93-122``) with direct
distributed writes. Parquet is the default; partition columns express the
100 TB layout (e.g. fact partitioned by arrival year/month so queries prune
partitions at the scan).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    """CSV sink (S4/S5; reference dataprep.py:227). Kept for interchange only."""
    df.write.mode(mode).option("header", header).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink — interchange with log/event tooling."""
    df.write.mode(mode).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def compact(
    df: DataFrame,
    path: str,
    target_file_rows: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Small-files compaction: rewrite a dataset capping rows per output
    file. At 100 TB the killer is not data volume but file count —
    streaming ingest and fine partitioning leave millions of KB-sized
    files that turn every scan into a listing storm. ``maxRecordsPerFile``
    splits large partitions; AQE-coalesced shuffle-free rewrite merges
    small ones (repartition only if the caller asks via df.repartition
    upstream)."""
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", target_file_rows)
        .parquet(path)
    )
