"""Declarative source layer.

Replaces the reference's three ingestion paths — pandas ``read_csv``
(``dataprep.py:19,102,155``), the sas7bdat Spark connector
(``dataprep.py:197-201``), and Redshift ``COPY`` (``sql_queries.py:93-122``) —
with Spark readers that keep filter pushdown and column pruning intact.

Design notes for scale: always pass an explicit schema (no ``inferSchema``
pass over 100 TB), and let the parquet reader prune columns/row-groups from
the declarative plan. The Redshift staging hop disappears entirely: a scan
*is* the staging table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    sep: str = ",",
    header: bool = True,
) -> DataFrame:
    """CSV scan with custom delimiter (S1/S2; reference dataprep.py:19,102,155)."""
    reader = (
        spark.read.option("sep", sep)
        .option("header", header)
        .option("mode", "PERMISSIVE")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)  # convenience path; tests only
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan — the engine's default columnar source."""
    return spark.read.parquet(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same pushdown/pruning properties as parquet; offered so
    warehouses already laid out in ORC can be read without conversion."""
    return spark.read.orc(path)


def read_sas(spark: SparkSession, path: str) -> DataFrame:
    """SAS sas7bdat scan via the optional connector jar (S3; reference
    dataprep.py:197-201).

    The DOCUMENTED production route is :func:`..sources.sas.ingest_sas` —
    one-time chunked conversion to parquet (pandas' built-in sas7bdat
    reader, no extra dependency), then splittable/pruned parquet scans.
    This raw-connector path stays for clusters that ship the saurfang jar;
    it is gated here because the jar is not in this image.
    """
    try:
        return spark.read.format("com.github.saurfang.sas.spark").load(path)
    except Exception as exc:  # pragma: no cover - connector not installed
        raise NotImplementedError(
            "sas7bdat connector not on classpath; convert to parquet upstream "
            "or add the spark-sas7bdat package"
        ) from exc


def read_text(
    spark: SparkSession, path: str, whole_file: bool = False
) -> DataFrame:
    """Line-based text source (one row per line, column ``value``), or one
    row per file with ``wholetext`` — the raw-corpus ingestion path before
    any parsing."""
    return spark.read.text(path, wholetext=whole_file)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """``binaryFile`` source: (path, modificationTime, length, content) —
    the ingestion path for multimodal payloads (images/audio/video) into
    opaque binary columns (operators/multimodal.py takes over from here).
    Not splittable per file; parallelism = file count, so shard large
    media archives upstream."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan via the external spark-avro module (not in this image —
    gated exactly like the SAS connector; parquet is the engine's
    canonical interchange format)."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as exc:  # pragma: no cover - module not installed
        raise NotImplementedError(
            "spark-avro module not on classpath; add org.apache.spark:"
            "spark-avro or convert to parquet upstream"
        ) from exc


def load_testdata(
    spark: SparkSession, sf_dir: str, *names: str
) -> dict[str, DataFrame]:
    """Load driver testdata tables (``{sf_dir}/{name}.parquet``) as a dict."""
    from ..schemas import TESTDATA_TABLES

    use = names or TESTDATA_TABLES
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in use}


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql() access."""
    for name, df in load_testdata(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
