"""Streaming checkpoint/restart recovery: a query stopped mid-input and
restarted from its checkpoint must produce exactly the output of an
uninterrupted run — no lost windows, no duplicated windows (round 11).

The stream-vs-batch equivalence tests prove the STEADY-STATE semantics;
this proves the RECOVERY semantics: on restart, Structured Streaming
must resume the file-source offset log, the aggregation state store,
and the WATERMARK from the checkpoint. Each has a distinct failure
smell: a lost offset re-processes a file (duplicate windows in the
append sink), lost state under-counts the window that straddled the
stop, and a reset watermark (restarting from -inf) re-opens closed
windows. At 100 TB a streaming job WILL be preempted mid-input, so
restart-exactly-once is the semantics that matters most in production.

Shape: the sf0.001 events split at the median timestamp into two
parquet deliveries. Run A processes delivery 1, STOPS (executor-loss
simulation), restarts on the same checkpoint, processes delivery 2.
Run B processes both deliveries uninterrupted on a fresh checkpoint.
Both drain with processAllAvailable; final watermarks agree (same max
event time), so the append-mode emission sets must agree exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import events_table
from data_engineering_project_capstone_spark.streaming.events import (
    tumbling_counts,
)


def _write_halves(spark, sf_dir, base):
    events = events_table(spark, sf_dir).select(
        "ts", "event_type", "value"
    )
    cut = events.agg(
        F.expr("percentile_approx(ts, 0.5)").alias("m")
    ).collect()[0]["m"]
    half1 = events.filter(F.col("ts") <= F.lit(cut))
    half2 = events.filter(F.col("ts") > F.lit(cut))
    p1 = os.path.join(base, "delivery1")
    p2 = os.path.join(base, "delivery2")
    half1.coalesce(1).write.parquet(p1)
    half2.coalesce(1).write.parquet(p2)
    return half1.schema, p1, p2


def _start(spark, schema, in_dir, out_dir, ckpt):
    stream = (
        spark.readStream.schema(schema).format("parquet").load(in_dir)
    )
    return (
        tumbling_counts(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .start()
    )


def _drain(q):
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()


def _deliver(src_dir, in_dir, tag):
    for i, f in enumerate(os.listdir(src_dir)):
        if f.endswith(".parquet"):
            os.symlink(
                os.path.join(src_dir, f),
                os.path.join(in_dir, f"{tag}_{i}.parquet"),
            )


def _rows(spark, out_dir):
    return sorted(
        tuple(r) for r in spark.read.parquet(out_dir).collect()
    )


def test_restart_from_checkpoint_is_exactly_once(spark, sf_dir, tmp_path):
    schema, p1, p2 = _write_halves(spark, sf_dir, str(tmp_path))

    # Run A: delivery 1 → stop → RESTART on the same checkpoint → delivery 2
    in_a = tmp_path / "in_a"
    in_a.mkdir()
    out_a, ckpt_a = str(tmp_path / "out_a"), str(tmp_path / "ckpt_a")
    _deliver(p1, str(in_a), "d1")
    _drain(_start(spark, schema, str(in_a), out_a, ckpt_a))
    phase1 = _rows(spark, out_a)
    _deliver(p2, str(in_a), "d2")
    _drain(_start(spark, schema, str(in_a), out_a, ckpt_a))
    restarted = _rows(spark, out_a)

    # Run B: both deliveries, uninterrupted, fresh checkpoint
    in_b = tmp_path / "in_b"
    in_b.mkdir()
    out_b, ckpt_b = str(tmp_path / "out_b"), str(tmp_path / "ckpt_b")
    _deliver(p1, str(in_b), "d1")
    _deliver(p2, str(in_b), "d2")
    _drain(_start(spark, schema, str(in_b), out_b, ckpt_b))
    uninterrupted = _rows(spark, out_b)

    # exactly-once across the restart: nothing lost, nothing duplicated
    assert restarted == uninterrupted
    # the restart made progress beyond the pre-stop emission
    assert len(restarted) > len(phase1)
    # per-key uniqueness — a re-processed file would double-emit a window
    keys = [(r[0], r[2]) for r in restarted]
    assert len(keys) == len(set(keys))

    # emitted values match the batch twin over the FULL input
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in (
            events_table(spark, sf_dir)
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 2).alias("sum_value"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                "event_type",
                "n_events",
                "sum_value",
            )
            .collect()
        )
    }
    for r in restarted:
        assert batch[(r[0], r[2])] == (r[3], r[4])
