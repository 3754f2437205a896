"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query on sf0.001.
``queries()`` / ``oracle_sql()`` — the oracle-paired operator catalog from
``data_engineering_project_capstone_spark.plans.catalog`` (see SURVEY.md §2 for
the operator inventory each entry covers).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineering_project_capstone_spark.plans import catalog as _catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Capstone Q3 shape (reference README.md:200-214): multi-hop dim join
    chain, per-group count, broadcast cross-join grand total, pct-of-total.
    """
    return _catalog.q3_pct_of_total(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query."""
    return _catalog.oracle_sql()
