"""Canonical SAS ingestion path: chunked convert-to-parquet → Spark scan →
prep_travelers, matching reference dataprep.py:197-227 semantics.

No SAS *writer* exists in this environment, so the chunk source is a fake
pandas reader with the exact i94 sas7bdat shape (float-typed numerics, SAS
day-number dates — what pandas.read_sas actually yields); everything from
the chunk boundary onward (row groups, schema, scan, prep) is real.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from data_engineering_project_capstone_spark.operators.travelers import prep_travelers
from data_engineering_project_capstone_spark.sources.sas import (
    convert_sas_to_parquet,
    ingest_sas,
)

# pandas.read_sas yields all-float numerics and bytes-ish strings; the
# fake mirrors the float typing (the awkward part).
CHUNK1 = pd.DataFrame(
    {
        "i94port": ["JFK", "XXX", "SFO"],
        "arrdate": [20454.0, 20454.0, 20455.0],  # days since 1960-01-01
        "i94bir": [34.0, 40.0, 28.0],
        "i94visa": [1.0, 2.0, 3.0],
        "biryear": [1982.0, 1976.0, 1988.0],
        "gender": ["M", "F", None],
    }
)
CHUNK2 = pd.DataFrame(
    {
        "i94port": ["LAX", "JFK"],
        "arrdate": [20460.0, 20500.0],
        "i94bir": [52.0, 19.0],
        "i94visa": [2.0, 1.0],
        "biryear": [1964.0, 1997.0],
        "gender": ["F", "M"],
    }
)


def fake_reader(path, chunksize):
    assert path.endswith(".sas7bdat")
    yield CHUNK1
    yield CHUNK2


@pytest.fixture()
def sas_file(tmp_path):
    p = tmp_path / "i94_jan16_sub.sas7bdat"
    p.write_bytes(b"\x00sas7bdat-placeholder")  # mtime source only
    return str(p)


def test_convert_writes_one_row_group_per_chunk(tmp_path, sas_file):
    out = str(tmp_path / "out.parquet")
    convert_sas_to_parquet(sas_file, out, _reader=fake_reader)
    meta = pq.ParquetFile(out).metadata
    assert meta.num_rows == 5
    assert meta.num_row_groups == 2  # streamed, not buffered


def test_convert_empty_sas_raises(tmp_path, sas_file):
    with pytest.raises(ValueError, match="no rows"):
        convert_sas_to_parquet(
            sas_file, str(tmp_path / "e.parquet"), _reader=lambda p, c: iter(())
        )


def test_ingest_sas_end_to_end_matches_reference_semantics(spark, tmp_path, sas_file):
    cache = str(tmp_path / "cache")
    raw = ingest_sas(spark, sas_file, cache, _reader=fake_reader)
    rows = prep_travelers(raw).collect()

    # XXX port (dataprep.py:207) and null gender (dataprep.py:221) dropped
    assert len(rows) == 3
    assert all(r["iata_code"] != "XXX" for r in rows)
    assert all(r["gender"] is not None for r in rows)

    # SAS day 20454 = 1960-01-01 + 20454 days = 2016-01-01 (i94 Jan 2016)
    jfk1 = [r for r in rows if r["iata_code"] == "JFK" and r["age"] == 34][0]
    assert (jfk1["arrival_year"], jfk1["arrival_month"], jfk1["arrival_day"]) == (
        2016, 1, 1,
    )
    # casts landed as ints (dataprep.py:224-226)
    assert isinstance(jfk1["age"], int) and isinstance(jfk1["visa_code"], int)
    assert jfk1["year_of_birth"] == 1982


def test_ingest_sas_caches_conversion(spark, tmp_path, sas_file):
    cache = str(tmp_path / "cache")
    calls = {"n": 0}

    def counting_reader(path, chunksize):
        calls["n"] += 1
        yield CHUNK1

    ingest_sas(spark, sas_file, cache, _reader=counting_reader).count()
    ingest_sas(spark, sas_file, cache, _reader=counting_reader).count()
    assert calls["n"] == 1  # second call reused the converted parquet

    # touching the source invalidates the cache
    os.utime(sas_file)
    ingest_sas(spark, sas_file, cache, _reader=counting_reader).count()
    assert calls["n"] == 2
