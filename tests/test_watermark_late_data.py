"""Watermark semantics: a second micro-batch carrying data older than the
advanced watermark must be dropped from append-mode windowed output."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_late_rows_dropped_by_watermark(spark):
    stage = tempfile.mkdtemp(prefix="late_data_")
    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    # batch 1: events up to 06:00 → watermark advances to 06:00 - 1h = 05:00
    _write_batch(
        spark,
        stage,
        [
            (1, base + dt.timedelta(hours=1, minutes=10), 1.0),
            (2, base + dt.timedelta(hours=1, minutes=20), 2.0),
            (3, base + dt.timedelta(hours=6), 3.0),
        ],
    )

    stream = spark.readStream.schema(SCHEMA).format("parquet").load(stage)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: one punctual event (07:00) and one LATE event in the
        # 01:00 window, far behind the 05:00 watermark
        _write_batch(
            spark,
            stage,
            [
                (4, base + dt.timedelta(hours=7), 4.0),
                (5, base + dt.timedelta(hours=1, minutes=30), 99.0),  # late
            ],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    out = {r["ws"]: r["n"] for r in spark.sql("SELECT * FROM late_out").collect()}
    h1 = base + dt.timedelta(hours=1)
    # the 01:00 window was finalized by the batch-1 watermark with exactly
    # the two punctual events; the late event (id=5) must NOT appear
    assert out.get(h1) == 2, f"late row leaked into finalized window: {out}"
