"""JSON-lines and ORC round-trips through the source layer, plus the
small-files compaction utility. CSV and parquet round-trips live in
test_csv_roundtrip.py; this covers the remaining interchange formats."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import t
from data_engineering_project_capstone_spark.sources import (
    compact,
    read_json,
    read_orc,
    write_json,
    write_orc,
)


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy(df.columns).collect()]


def test_json_roundtrip(spark, sf_dir, tmp_path):
    src = t(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_json")
    write_json(src, path)
    back = read_json(spark, path, schema=src.schema)
    assert _sorted_rows(back) == _sorted_rows(src)


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    src = t(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.count() == src.count()
    # ORC scans must push predicates like parquet does
    filtered = back.filter(F.col("o_totalprice") > 100000.0).select("o_orderkey")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_totalprice" in plan.split("PushedFilters")[1][:200]
    expect = src.filter(F.col("o_totalprice") > 100000.0).count()
    assert filtered.count() == expect


def test_compact_reduces_file_count(spark, sf_dir, tmp_path):
    src = t(spark, sf_dir, "orders")
    fragmented = str(tmp_path / "fragmented")
    # simulate streaming debris: many tiny files
    src.repartition(16).write.mode("overwrite").parquet(fragmented)
    n_before = len(glob.glob(f"{fragmented}/*.parquet"))
    assert n_before >= 16

    compacted = str(tmp_path / "compacted")
    compact(spark.read.parquet(fragmented).coalesce(1), compacted)
    n_after = len(glob.glob(f"{compacted}/*.parquet"))
    assert n_after < n_before
    assert spark.read.parquet(compacted).count() == src.count()


def test_compact_caps_rows_per_file(spark, sf_dir, tmp_path):
    src = t(spark, sf_dir, "orders").coalesce(1)
    n = src.count()
    out = str(tmp_path / "capped")
    compact(src, out, target_file_rows=max(n // 4, 1))
    files = glob.glob(f"{out}/*.parquet")
    # one input partition split into ~4 capped files
    assert len(files) >= 4
    assert spark.read.parquet(out).count() == n
