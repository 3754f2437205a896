"""Semantic invariants for the round-6p eval/QC entries."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.operators.text import lang_id
from data_engineering_project_capstone_spark.plans.catalog import CATALOG, t

SF = "/root/testdata/sf0.001"


def test_langid_confusion_mass_and_diagonal(spark):
    """The matrix must partition all documents, and its diagonal must
    equal the classifier's per-lang agreement recomputed directly."""
    rows = CATALOG["langid_confusion"].spark_fn(spark, SF).collect()
    n_docs = t(spark, SF, "documents").count()
    assert sum(r["n"] for r in rows) == n_docs
    agree = (
        t(spark, SF, "documents")
        .filter(
            F.coalesce(F.col("lang"), F.lit("und")) == lang_id("text")
        )
        .count()
    )
    diag = sum(r["n"] for r in rows if r["true_lang"] == r["pred_lang"])
    assert diag == agree
    assert diag > 0, "the heuristic must agree with labels somewhere"


def test_embedding_qc_ledger_consistency(spark):
    [r] = CATALOG["embedding_norm_outliers"].spark_fn(spark, SF).collect()
    n = t(spark, SF, "embeddings").count()
    assert r["n_rows"] == n
    assert r["n_null_vectors"] + r["n_zero_norm"] <= n
    assert r["mean_norm"] > 0
    assert r["std_norm"] >= 0
    assert 0 <= r["n_norm_outliers"] <= n
