"""Semantic invariants for the round-6l experiment/DQ entries."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import (
    CATALOG,
    events_table,
    t,
)

SF = "/root/testdata/sf0.001"


def test_ab_assignment_is_hash_deterministic(spark):
    """Variant sizes must equal the Python md5 recomputation, both
    variants must be nonempty, and the z statistic must satisfy the
    two-proportion formula on the reported counts."""
    users = [
        r["user_id"]
        for r in events_table(spark, SF)
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id")
        .distinct()
        .collect()
    ]
    def bucket(u):
        return int(hashlib.md5(f"{u}:ab".encode()).hexdigest()[:15], 16) % 2
    na = sum(1 for u in users if bucket(u) == 0)
    rows = {r["variant"]: r for r in
            CATALOG["ab_test_analysis"].spark_fn(spark, SF).collect()}
    assert set(rows) == {"A", "B"}
    assert rows["A"]["n_users"] == na
    assert rows["B"]["n_users"] == len(users) - na
    a, b = rows["A"], rows["B"]
    p = (a["n_converted"] + b["n_converted"]) / (a["n_users"] + b["n_users"])
    if 0 < p < 1:
        z = (
            b["n_converted"] / b["n_users"] - a["n_converted"] / a["n_users"]
        ) / math.sqrt(p * (1 - p) * (1 / a["n_users"] + 1 / b["n_users"]))
        assert abs(a["z_stat"] - round(z, 6)) < 1e-6
        assert a["z_stat"] == b["z_stat"]


def test_benford_frequencies_sum_to_one(spark):
    rows = CATALOG["benford_digit_test"].spark_fn(spark, SF).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["obs_freq"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert abs(r["benford_freq"] - round(math.log10(1 + 1 / r["digit"]), 6)) < 1e-9
        assert r["chi2_term"] >= 0


def test_seasonality_indexes_average_to_one(spark):
    rows = CATALOG["events_seasonality"].spark_fn(spark, SF).collect()
    n_tot = sum(r["n_events"] for r in rows)
    # weighted identity: Σ n_h·24/N over hours = 24 → mean index over
    # PRESENT hours equals 1 only when all 24 hours appear
    assert all(r["seasonal_index"] > 0 for r in rows)
    if len(rows) == 24:
        assert abs(sum(r["seasonal_index"] for r in rows) / 24 - 1.0) < 1e-4
    ev = events_table(spark, SF).filter(F.col("ts").isNotNull()).count()
    assert n_tot == ev


def test_ri_audit_clean_schema_and_planted_orphan(spark, tmp_path):
    """The shipped testdata must audit clean; a corrupted child table
    must surface its orphans."""
    import shutil

    rows = CATALOG["ri_audit"].spark_fn(spark, SF).collect()
    assert len(rows) == 7
    assert all(r["orphans"] == 0 for r in rows)
    # plant orphans: copy the SF dir, shift some nation FKs out of range
    d = tmp_path / "corrupt"
    d.mkdir()
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"):
        shutil.copy(f"{SF}/{name}.parquet", d / f"{name}.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    cust.withColumn(
        "c_nationkey",
        F.when(F.col("c_custkey") % 50 == 0, F.lit(9999)).otherwise(
            F.col("c_nationkey")
        ),
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "_c"))
    import glob
    import os

    part_file = glob.glob(str(d / "_c" / "part-*.parquet"))[0]
    os.replace(part_file, d / "customer.parquet")
    rows2 = {
        r["edge"]: r["orphans"]
        for r in CATALOG["ri_audit"].spark_fn(spark, str(d)).collect()
    }
    assert rows2["customer.nationkey->nation"] > 0
    assert rows2["nation.regionkey->region"] == 0
