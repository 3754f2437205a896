"""Streaming count-min sketch maintenance: per-batch cell deltas with
batch_id-partitioned idempotent writes, read-time merge, and equivalence
with the single-pass batch sketch."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.streaming.sketches import (
    cms_batch_writer,
    cms_cells,
    cms_estimate,
    read_cms,
    start_cms_sink,
)

SCHEMA = "event_id long, event_type string"


def _add_file(src, name, rows):
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        src / f"{name}.parquet",
    )


@pytest.fixture()
def src(tmp_path):
    d = tmp_path / "src"
    d.mkdir()
    _add_file(d, "b1", [(1, "click"), (2, "click"), (3, "view")])
    return d


def _run_stream(spark, src, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = start_cms_sink(stream, "event_type", out, ckpt)
    q.processAllAvailable()
    q.stop()


def test_streaming_sketch_equals_batch_sketch(spark, tmp_path, src):
    """Merged per-batch deltas must be cell-identical to the one-pass
    batch sketch over the union of all inputs — the mergeability
    contract, across a stream restart that adds a second batch."""
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run_stream(spark, src, out, ckpt)
    _add_file(src, "b2", [(4, "view"), (5, "purchase"), (6, "click")])
    _run_stream(spark, src, out, ckpt)  # restart: only b2 is a new batch

    all_rows = spark.read.schema(SCHEMA).parquet(str(src))
    batch = {
        (r["d"], r["bucket"]): r["cell"]
        for r in cms_cells(all_rows, "event_type").collect()
    }
    merged = {
        (r["d"], r["bucket"]): r["cell"]
        for r in read_cms(spark, out).collect()
    }
    assert merged == batch


def test_estimates_dominate_truth(spark, tmp_path, src):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _add_file(src, "b2", [(4, "view"), (5, "purchase"), (6, "click")])
    _run_stream(spark, src, out, ckpt)
    rows = spark.read.schema(SCHEMA).parquet(str(src))
    truth = {
        r["event_type"]: r["n"]
        for r in rows.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    est = {
        r["item"]: r["est"]
        for r in cms_estimate(read_cms(spark, out), rows, "event_type").collect()
    }
    assert set(est) == set(truth)
    for item, n in truth.items():
        assert est[item] >= n, item


def test_batch_redelivery_is_idempotent(spark, tmp_path, src):
    """Re-running the same batch_id (Structured Streaming's re-delivery
    contract after a sink-side failure) must leave the merged sketch
    unchanged — the dynamic-overwrite partition makes the write replace,
    not add."""
    out = str(tmp_path / "out")
    df = spark.read.schema(SCHEMA).parquet(str(src))
    writer = cms_batch_writer(out, "event_type")
    writer(df, 0)
    once = {
        (r["d"], r["bucket"]): r["cell"]
        for r in read_cms(spark, out).collect()
    }
    writer(df, 0)  # redelivery
    twice = {
        (r["d"], r["bucket"]): r["cell"]
        for r in read_cms(spark, out).collect()
    }
    assert once == twice


def test_streaming_cells_match_catalog_entry_hashing(spark, tmp_path):
    """The streaming maintainer and the batch catalog entry must bucket
    identically — same md5 idiom, same (d, bucket) for the same item."""
    from data_engineering_project_capstone_spark.plans.catalog_r6c import (
        _CMS_D,
        _CMS_W,
    )
    from data_engineering_project_capstone_spark.streaming.sketches import (
        CMS_D,
        CMS_W,
    )

    assert (CMS_D, CMS_W) == (_CMS_D, _CMS_W)
    df = spark.createDataFrame([("alpha",), ("alpha",), ("beta",)], "tok string")
    cells = cms_cells(df, "tok").collect()
    # 2 distinct items × D rows, no bucket collisions expected at W=256
    assert len(cells) == 2 * CMS_D
    assert {r["cell"] for r in cells} == {1, 2}
