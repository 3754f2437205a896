"""Semantic invariants for the round-6j retrieval-eval entries."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.operators.similarity import (
    cosine_topk,
)
from data_engineering_project_capstone_spark.plans.catalog import CATALOG, t

SF = "/root/testdata/sf0.001"


def test_rrf_scores_decompose_into_rank_terms(spark):
    """Every fused score must be exactly 1/(60+lex) + 1/(60+sem) with
    NULL ranks contributing zero, and the output must be sorted."""
    rows = CATALOG["rrf_fusion"].spark_fn(spark, SF).collect()
    assert rows
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        want = 0.0
        if r["lex_rank"] is not None:
            want += 1.0 / (60 + r["lex_rank"])
        if r["sem_rank"] is not None:
            want += 1.0 / (60 + r["sem_rank"])
        assert abs(r["rrf_score"] - round(want, 6)) < 1e-9
    # at least one doc must be fused from BOTH lists for the entry to
    # exercise the full-outer semantics
    assert any(
        r["lex_rank"] is not None and r["sem_rank"] is not None for r in rows
    )


def test_ndcg_matches_python_recomputation(spark):
    """nDCG@10 recomputed in pure Python from the exact top-k list and
    label counts must match, and land in [0, 1]."""
    emb = t(spark, SF, "embeddings").filter(F.col("embedding").isNotNull())
    labels = {
        r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()
    }
    topk = cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=10).collect()
    by_q: dict[int, list] = {}
    for r in topk:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    want = {}
    for q, lst in by_q.items():
        dcg = sum(
            1.0 / math.log2(rank + 1.0)
            for rank, nid in lst
            if labels[nid] == labels[q]
        )
        r_tot = sum(1 for v, l in labels.items() if l == labels[q] and v != q)
        if r_tot > 0:
            idcg = sum(
                1.0 / math.log2(i + 1.0) for i in range(1, min(r_tot, 10) + 1)
            )
            want[q] = round(dcg / idcg, 6)
        else:
            want[q] = 0.0
    got = {
        r["query_id"]: r["ndcg"]
        for r in CATALOG["ndcg_label_eval"].spark_fn(spark, SF).collect()
    }
    assert set(got) == set(want)
    for q in want:
        assert abs(got[q] - want[q]) < 1e-6
        assert 0.0 <= got[q] <= 1.0 + 1e-9
