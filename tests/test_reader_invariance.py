"""Vectorized-reader-off invariance: every catalog entry must return
identical results with Spark's vectorized parquet reader disabled —
the fifth plan-level invariance axis (round 11), alongside partition
count, physical layout, AQE, and whole-stage codegen.

``spark.sql.parquet.enableVectorizedReader=false`` routes every scan
through the parquet-mr record-materialization path instead of the
columnar ``VectorizedColumnReader`` — a DISJOINT decoder
implementation of every physical type in the data (dictionary and
plain encodings, timestamps, doubles, binary, nested arrays for the
embedding column). Reader-implementation divergence is a known Spark
bug class (dictionary-decoding and timestamp bugs have shipped in the
vectorized reader historically), and at 100 TB both paths run in
production: Spark silently falls back to parquet-mr for schemas the
vectorized reader can't handle, so an answer that differs between the
two readers is a wrong answer on some cluster.

Complements test_schema_shape (which re-encodes the FILES adversarially
but always reads through the vectorized path): here the files are
fixed and the READER implementation flips. Spark scopes SQL confs per
session, so the flip never touches the shared fixture session.

Full catalog (not just the shuffle-sensitive list): reader divergence
is a scan-level class, so every entry that scans any column type is in
scope — selection by sensitivity would assume the answer.
"""

from __future__ import annotations

import pytest

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark_rowreader(spark):
    s = spark.newSession()
    s.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
    assert s.conf.get("spark.sql.parquet.enableVectorizedReader") == "false"
    # the shared fixture session must be untouched
    assert spark.conf.get("spark.sql.parquet.enableVectorizedReader") == "true"
    return s


def _rows(session, name):
    return sorted(
        (tuple(r) for r in CATALOG[name].spark_fn(session, SF).collect()),
        key=repr,
    )


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_result_invariant_without_vectorized_reader(
    spark, spark_rowreader, name
):
    vectorized = _rows(spark, name)
    row_by_row = _rows(spark_rowreader, name)
    assert vectorized == row_by_row, (
        f"{name}: result depends on the parquet reader implementation"
    )
