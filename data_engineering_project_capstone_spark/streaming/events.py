"""Structured Streaming surface over the events table.

The reference is pure batch (SURVEY.md §2.8: streaming "none") — this module
is the north-star extension: the same event-analytics queries, expressed
once, runnable both as a stream (readStream + watermark + windowed state)
and as batch (the catalog's events_* entries are the batch twins the oracle
can check).

Scale posture: watermarks bound state; windowed aggs shuffle on
(window, key) which AQE sizes; `session_window` keeps per-key state merged
by the state store, not the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_raw_schema(spark: SparkSession, sf_dir: str) -> T.StructType:
    """File-stream sources need a declared schema. The testdata's ts column
    has shipped both as TIMESTAMP(NANOS) (epoch-ns BIGINT under nanosAsLong)
    and as timestamp[us]; read the real schema from the batch reader so the
    stream always matches the files on disk."""
    return spark.read.parquet(f"{sf_dir}/events.parquet").schema


_STAGE_ROOT: str | None = None  # process-lifetime symlink staging root


def _with_ts(df: DataFrame) -> DataFrame:
    """Normalize ts to TIMESTAMP — same branch as plans.catalog.events_table."""
    if isinstance(df.schema["ts"].dataType, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def read_events_stream(
    spark: SparkSession, sf_dir: str, copies: int = 1, staging_dir: str | None = None
) -> DataFrame:
    """File-source stream over the events parquet (one-file demo source;
    swap for kafka/kinesis in production — the downstream plan is
    identical).

    The file stream source requires a *directory*; the testdata ships one
    flat file, so it is exposed through a symlink dir. ``copies > 1``
    symlinks the same file N times — an at-least-once delivery simulator
    for exercising streaming dedup.

    ``staging_dir``: caller-owned directory for the symlinks (caller
    controls its lifetime — the test fixtures pass tmp_path). When omitted
    a process-lifetime temp dir is created once and removed at interpreter
    exit; repeated calls reuse it (one subdir per call) instead of leaking
    a fresh mkdtemp every call.
    """
    import os
    import tempfile

    from ..plans.catalog import _ensure_session_conf

    _ensure_session_conf(spark)
    if staging_dir is None:
        global _STAGE_ROOT
        if _STAGE_ROOT is None:
            import atexit
            import shutil

            _STAGE_ROOT = tempfile.mkdtemp(prefix="events_stream_")
            atexit.register(shutil.rmtree, _STAGE_ROOT, ignore_errors=True)
        staging_dir = _STAGE_ROOT
    stage = tempfile.mkdtemp(prefix="src_", dir=staging_dir)
    for i in range(copies):
        os.symlink(f"{sf_dir}/events.parquet", os.path.join(stage, f"events_{i}.parquet"))
    raw = (
        spark.readStream.schema(_events_raw_schema(spark, sf_dir))
        .format("parquet")
        .load(stage)
    )
    return _with_ts(raw)


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Per-window per-type counts + sums. Watermark bounds state for late
    data; append mode emits each window once it's final."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window counts (each event lands in window/slide windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_window_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (gap-based), the streaming-native
    sessionization: state-store merged, no global sort."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: lag + cumulative-sum session ids, then session
    aggregates. The batch twin of :func:`session_window_agg` (and the
    oracle-checkable one: DuckDB computes the identical windows).

    Shuffles once on user_id; the window sort is per-user, not global.

    NULL-ts events are excluded: an event without a time cannot be
    ordered into a session (the streaming twin's watermark would drop it
    anyway), and engines disagree on NULL placement in window sorts
    (Spark NULLS FIRST vs DuckDB NULLS LAST) — see
    tests/test_degenerate_events.py.
    """
    events = events.filter(F.col("ts").isNotNull())
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w_user)
    is_new = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    with_sess = events.withColumn(
        "session_seq",
        F.sum(is_new).over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_sess.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_seq").cast("long").alias("session_seq"),
            "session_start",
            "session_end",
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup for at-least-once sources:
    ``dropDuplicatesWithinWatermark`` keys state on event_id and drops it
    once the watermark passes — bounded state, unlike a plain streaming
    ``dropDuplicates`` whose key set grows forever. The batch twin is
    ``df.dropDuplicates(["event_id"])`` (catalog:dedup_exact family)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def enrich_with_user_stats(events: DataFrame, user_stats: DataFrame) -> DataFrame:
    """Stream-static join: attach a (small, slowly-changing) per-user dim
    to the live stream. Stateless — the static side broadcasts, each
    micro-batch joins map-side; the production shape for dimension
    enrichment at any stream rate."""
    return events.join(F.broadcast(user_stats), "user_id", "left")


def click_purchase_funnel(
    clicks: DataFrame,
    purchases: DataFrame,
    max_lag_minutes: int = 60,
    watermark: str = "2 hours",
    join_type: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: purchases attributed to the same
    user's click within ``max_lag_minutes``. Both sides carry watermarks
    and the join condition bounds event time on both sides, so each
    side's buffered state is evictable — the canonical funnel/attribution
    join. Works identically on batch DataFrames (watermarks are a no-op
    there), which is what the equivalence test exploits.

    ``join_type="leftOuter"`` keeps UNCONVERTED clicks: Spark holds the
    null-match back until the watermark proves no in-window purchase can
    still arrive, then emits the click with NULL purchase columns — the
    abandonment/non-conversion readout. The outer side therefore emits
    LATE by construction (one watermark delay after the window closes);
    a downstream consumer must not treat null rows as "missing", only
    as "not yet provably unmatched" until the watermark passes.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if p.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {max_lag_minutes} MINUTES")
        )
    )
    return c.join(p, cond, join_type).select(
        F.col("c_user_id").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


def run_stream_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "append"
) -> DataFrame:
    """Drive a streaming query synchronously to completion against the
    file source and return the materialized result (test harness)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")
