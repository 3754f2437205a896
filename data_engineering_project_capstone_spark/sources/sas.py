"""SAS sas7bdat ingestion — the documented production route.

The reference reads SAS files straight into Spark through the saurfang
``spark-sas7bdat`` connector (``/root/reference/dataprep.py:197-201``).
That connector is an optional external jar, and sas7bdat itself is a
single-machine, non-splittable artifact — so regardless of connector
availability, the scale-correct pattern is CONVERT ONCE, SCAN FOREVER:

1. :func:`convert_sas_to_parquet` — a one-time, chunk-streamed conversion
   using pandas' built-in sas7bdat reader (no extra dependency). Each
   chunk becomes a parquet row group, so files of any length convert in
   bounded memory. Run once per SAS file (they are bounded-size exports by
   construction; parallelize across files, not within one).
2. Every downstream query scans the parquet with full column pruning,
   predicate pushdown, and splittable parallelism — none of which the SAS
   connector ever offered.

:func:`ingest_sas` wires the two stages together and is what a pipeline
should call; ``readers.read_sas`` (the raw connector path) stays available
for clusters that do ship the jar.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def convert_sas_to_parquet(
    sas_path: str,
    parquet_path: str,
    chunksize: int = 100_000,
    _reader: Callable[[str, int], Iterable[Any]] | None = None,
) -> str:
    """One-time sas7bdat → parquet conversion, streamed in bounded memory.

    ``_reader`` is the chunk source, defaulting to ``pandas.read_sas``;
    tests inject a fake (no SAS *writer* exists in this environment to
    produce a real fixture — the chunking/schema/row-group plumbing is
    what this function owns, and it is fully exercised).
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    if _reader is None:
        def _reader(path: str, cs: int):
            return pd.read_sas(path, format="sas7bdat", chunksize=cs, iterator=True)

    # Stream into a sibling temp file and os.replace() onto the final name
    # only after the writer closes cleanly: a crash mid-conversion must
    # never leave a truncated parquet at the final path, because
    # ingest_sas's mtime freshness check would then treat the partial file
    # as a valid cache hit forever after.
    tmp_path = f"{parquet_path}.tmp-{os.getpid()}"
    writer: pq.ParquetWriter | None = None
    try:
        for chunk in _reader(sas_path, chunksize):
            tbl = pa.Table.from_pandas(chunk, preserve_index=False)
            if writer is None:
                writer = pq.ParquetWriter(tmp_path, tbl.schema)
            writer.write_table(tbl)
        if writer is None:
            raise ValueError(f"SAS file produced no rows: {sas_path}")
        writer.close()
        writer = None
        os.replace(tmp_path, parquet_path)
    finally:
        if writer is not None:
            writer.close()
        if os.path.exists(tmp_path):
            os.remove(tmp_path)
    return parquet_path


def ingest_sas(
    spark: SparkSession,
    sas_path: str,
    cache_dir: str,
    chunksize: int = 100_000,
    _reader: Callable[[str, int], Iterable[Any]] | None = None,
) -> DataFrame:
    """Canonical SAS ingestion: convert once into ``cache_dir`` (skipped
    when the converted file already exists and is newer than the source),
    then return a parquet scan over the result."""
    os.makedirs(cache_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(sas_path))[0]
    out = os.path.join(cache_dir, f"{stem}.parquet")
    if not (
        os.path.exists(out)
        and os.path.getmtime(out) >= os.path.getmtime(sas_path)
    ):
        convert_sas_to_parquet(sas_path, out, chunksize=chunksize, _reader=_reader)
    return spark.read.parquet(out)
