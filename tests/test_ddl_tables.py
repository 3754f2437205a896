"""S9/S10/S12 parity: DDL + managed tables through spark.sql and
saveAsTable (the reference's create_tables.py / INSERT chain as catalog
operations)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_managed_table_lifecycle(spark, sf_dir, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS star")
    spark.sql("DROP TABLE IF EXISTS star.nation_dim")

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nation.write.mode("overwrite").saveAsTable("star.nation_dim")

    # queryable via SQL, correct contents
    got = spark.sql("SELECT count(*) AS n FROM star.nation_dim").collect()[0]["n"]
    assert got == nation.count()

    # INSERT INTO ... SELECT (S12): append semantics
    spark.sql(
        "INSERT INTO star.nation_dim SELECT * FROM star.nation_dim WHERE n_nationkey < 5"
    )
    assert (
        spark.sql("SELECT count(*) AS n FROM star.nation_dim").collect()[0]["n"]
        == got + 5
    )

    # DROP TABLE IF EXISTS (S9)
    spark.sql("DROP TABLE IF EXISTS star.nation_dim")
    assert not spark.catalog.tableExists("star.nation_dim")
