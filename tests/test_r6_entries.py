"""Semantic invariants for the round-6 corpus-statistics entries —
properties the oracle differential can't express (it only proves
cross-engine agreement, not that the math means what the docstring says).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def test_kl_source_drift_invariants(spark):
    """Gibbs' inequality: KL ≥ 0 for every source (equality only when a
    source's distribution equals the corpus distribution exactly); and
    per-source token counts must sum to the corpus total."""
    out = CATALOG["kl_source_drift"].spark_fn(spark, SF).collect()
    assert out, "no sources"
    assert all(r["kl_divergence"] >= 0.0 for r in out)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_corpus = (
        docs.select(
            F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("n")
        ).agg(F.sum("n")).collect()[0][0]
    )
    assert sum(r["n_tokens"] for r in out) == n_corpus


def test_dsir_importance_separates_target(spark):
    """Documents from the target domain (lang='en') must average a higher
    importance weight than non-target documents — the whole point of the
    estimator. Also: every doc scored exactly once."""
    out = CATALOG["dsir_importance"].spark_fn(spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    joined = out.join(docs, "doc_id").collect()
    docs_n = docs.count()
    assert len(joined) == docs_n
    en = [r["dsir_weight"] for r in joined if r["lang"] == "en"]
    other = [r["dsir_weight"] for r in joined if r["lang"] != "en"]
    assert en and other
    assert sum(en) / len(en) > sum(other) / len(other)


def test_exact_substr_spans_bounds_and_planted_dup(spark):
    """dup_frac ∈ [0,1] with n_dup_tokens ≤ n_tokens everywhere; and two
    planted documents sharing a verbatim 20-token run are both flagged
    with ≥ 20 covered tokens while a unique-text doc stays at zero."""
    out = CATALOG["exact_substr_spans"].spark_fn(spark, SF).collect()
    for r in out:
        assert 0 <= r["n_dup_tokens"] <= r["n_tokens"]
        assert 0.0 <= r["dup_frac"] <= 1.0

    import tempfile

    shared = " ".join(f"w{i}" for i in range(20))
    rows = [
        (1, shared + " tail1 tail2 tail3", "en", "s0", 1),
        (2, "head1 head2 " + shared, "en", "s1", 1),
        (3, " ".join(f"u{i}" for i in range(30)), "en", "s0", 1),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{d}/documents.parquet")
        got = {
            r["doc_id"]: r
            for r in CATALOG["exact_substr_spans"].spark_fn(spark, d).collect()
        }
    assert got[1]["n_dup_tokens"] >= 20 and got[2]["n_dup_tokens"] >= 20
    assert got[3]["n_dup_tokens"] == 0 and got[3]["dup_frac"] == 0.0


def test_curation_pipeline_invariants(spark):
    """The composite must agree with its own stages run independently:
    every surviving stratum count ≤ the gated-corpus stratum count, no
    lang exceeds the 200-doc quota, and the report is non-empty with
    positive token totals."""
    out = CATALOG["curation_pipeline"].spark_fn(spark, SF).collect()
    assert out
    per_lang = {}
    for r in out:
        assert r["n_docs"] > 0 and r["total_tokens"] > 0
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + r["n_docs"]
    assert all(n <= 200 for n in per_lang.values())
    gates = CATALOG["text_gopher_filters"].spark_fn(spark, SF)
    n_gated = gates.filter(F.col("keep")).count()
    assert sum(per_lang.values()) <= n_gated
