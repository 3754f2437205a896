"""Output materialization round-trip: every catalog entry's RESULT must
survive write-to-parquet → read-back with identical schema and values
(round 11).

Every other net consumes results through ``collect()`` — but at 100 TB
results are MATERIALIZED (written to a table for the next pipeline
stage), and the write path has failure modes collect can never see:

- a void-typed column (an uncast ``F.lit(None)``) collects fine but
  refuses to write to parquet at all;
- timestamp precision is capped by the configured output type
  (micros) — a result depending on sub-micro precision silently
  truncates;
- NaN/±inf in min/max column statistics, empty-struct columns, and
  zero-row results each exercise writer branches the read path never
  does.

So: compute each entry at sf0.001, write parquet, read back, compare
schema and the full row multiset. Zero-row results still assert schema
round-trip — an empty DataFrame with an unwritable schema is the same
deployment hazard.

Schema comparison is modulo nullability: Spark's parquet reader reports
every field nullable by design (SPARK-19950 lineage — file schemas are
merged across files, so the reader can't trust NOT NULL), and that flag
carries no value information. Names and TYPES (recursively, through
arrays/maps/structs) must match exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def _erase_nullability(dt):
    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(f.name, _erase_nullability(f.dataType), True)
                for f in dt.fields
            ]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_erase_nullability(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(
            _erase_nullability(dt.keyType),
            _erase_nullability(dt.valueType),
            True,
        )
    return dt


def _rowset(df):
    # compare REPRs, not raw tuples: a float NaN is != itself, so raw
    # tuple equality fails on any NaN-bearing result even when the
    # parquet round-trip is byte-perfect (repr maps NaN -> 'nan' on both
    # sides; float repr round-trips exact values otherwise).
    return sorted(repr(tuple(r)) for r in df.collect())


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_output_roundtrips_through_parquet(spark, tmp_path, name):
    result = CATALOG[name].spark_fn(spark, SF)
    path = str(tmp_path / name)
    result.write.parquet(path)
    back = spark.read.parquet(path)
    assert _erase_nullability(back.schema) == _erase_nullability(
        result.schema
    ), f"{name}: schema changed through parquet materialization"
    assert _rowset(back) == _rowset(result), (
        f"{name}: values changed through parquet materialization"
    )
