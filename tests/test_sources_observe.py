"""Text/binaryFile sources and observe-based audit metrics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.observability import observe_counts
from data_engineering_project_capstone_spark.sources.readers import (
    read_avro,
    read_binary_files,
    read_text,
)


def test_read_text_lines_and_whole(spark, tmp_path):
    p = tmp_path / "corpus"
    p.mkdir()
    (p / "a.txt").write_text("line one\nline two\n")
    (p / "b.txt").write_text("solo\n")
    lines = read_text(spark, str(p))
    assert lines.count() == 3
    assert lines.columns == ["value"]
    whole = read_text(spark, str(p), whole_file=True)
    assert whole.count() == 2
    texts = {r["value"] for r in whole.collect()}
    assert "line one\nline two\n" in texts


def test_read_binary_files(spark, tmp_path):
    p = tmp_path / "media"
    p.mkdir()
    (p / "x.bin").write_bytes(b"\x00\x01\x02\x03")
    (p / "y.bin").write_bytes(b"\xff" * 10)
    (p / "skip.txt").write_text("not media")
    df = read_binary_files(spark, str(p), glob="*.bin")
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"x.bin", "y.bin"}
    assert rows["x.bin"]["length"] == 4
    assert bytes(rows["y.bin"]["content"]) == b"\xff" * 10


def test_read_avro_gated(spark, tmp_path):
    with pytest.raises(NotImplementedError, match="spark-avro"):
        read_avro(spark, str(tmp_path / "none.avro"))


def test_read_sas_connector_gated(spark, tmp_path):
    """The raw saurfang-connector branch executes its documented failure
    path where the jar is absent (round-6 audit: no sas7bdat/saurfang jar
    anywhere in the image, no ivy cache, no network to fetch one — the
    convert-once ingest_sas route in test_sas_ingest.py is the tested
    production path; re-audited round 7: `find / -name '*saurfang*' -o
    -name '*spark-sas*'` still empty, `import PIL` still absent, skip
    stays pinned)."""
    from data_engineering_project_capstone_spark.sources.readers import read_sas

    with pytest.raises(NotImplementedError, match="sas7bdat connector"):
        read_sas(spark, str(tmp_path / "none.sas7bdat"))


def test_observe_counts_no_extra_pass(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    audited, obs = observe_counts(
        orders,
        "orders_audit",
        null_cols=["o_custkey"],
        extra={"sum_price": F.round(F.sum("o_totalprice"), 2)},
    )
    # the one and only action: a real write, audited for free
    audited.write.mode("overwrite").parquet(str(tmp_path / "audited"))
    m = obs.get
    n = spark.read.parquet(str(tmp_path / "audited")).count()
    assert m["n_rows"] == n > 0
    assert m["n_null_o_custkey"] == 0
    assert m["sum_price"] > 0
