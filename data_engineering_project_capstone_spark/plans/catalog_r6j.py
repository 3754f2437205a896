"""Round-6j catalog entries — hybrid-retrieval fusion and ranking
evaluation, the readout side of the repo's retrieval stack:

- ``rrf_fusion``: Reciprocal Rank Fusion of the lexical (BM25 top-100,
  catalog_r5.bm25_scores' exact formulation) and semantic (exact
  cosine top-100 to query vector 0) rankings —
  score(d) = Σ_lists 1/(60 + rank_list(d)), the standard hybrid-search
  combiner. Docs appearing in only one list contribute only that term
  (full-outer fusion of top-k lists).
- ``ndcg_label_eval``: nDCG@10 of the exact cosine ranking per probe
  query (vec_id < 5), with binary relevance = "same label as the
  query" — the retrieval-quality metric computed WITHOUT external
  judgments, usable as a continuous eval for ANN index changes.

Float parity: rank-derived terms (1/(60+r), 1/log2(i+1)) are doubles
built from exact integers with a fixed fold order on both engines;
cosine reuses the established parity-safe norm/dot formulations.

Scale shape: both entries operate on top-k LISTS (≤100 rows per query
side), so every fusion/eval join is broadcast-sized regardless of
corpus size; the only corpus-scale work is the upstream scoring that
the bm25/similarity entries already bound (per-doc codegen folds plus
one top-k heap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from ..operators.similarity import cosine_topk
from .catalog import Entry, sql_ieee_round, t
from .catalog import _COS_SQL, _NORM_N_SQL
from .catalog_r5 import BM25_SCORES_SQL, bm25_scores

_RRF_K = 60
_RRF_TOP = 20
_NDCG_K = 10


def rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 docs by RRF of BM25(top-100) and cosine-to-query-0
    (top-100), with each list's rank carried through (NULL when the doc
    appears in only one list)."""
    bm = bm25_scores(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), "doc_id"))
        .alias("lex_rank"),
    )
    emb = t(spark, sf_dir, "embeddings")
    sem = (
        cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=100)
        .select(F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("sem_rank"))
    )
    fused = (
        bm.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.col("lex_rank").cast("long").alias("lex_rank"),
            F.col("sem_rank").cast("long").alias("sem_rank"),
            ieee_round(
                F.coalesce(1.0 / (_RRF_K + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_K + F.col("sem_rank")), F.lit(0.0)),
                6,
            ).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(_RRF_TOP)
    )
    return fused


RRF_FUSION_SQL = f"""
WITH bm_scores AS ({BM25_SCORES_SQL}),
bm AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
    FROM bm_scores
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v, {_NORM_N_SQL} AS n
      FROM embeddings WHERE embedding IS NOT NULL),
sem_scored AS (
    SELECT a.vec_id AS doc_id,
           {sql_ieee_round(_COS_SQL, 6)} AS cos
    FROM e a JOIN e b ON b.vec_id = 0 AND a.vec_id <> b.vec_id
),
sem AS (
    SELECT doc_id, rank AS sem_rank
    FROM (SELECT doc_id, cos,
                 row_number() OVER (ORDER BY cos DESC, doc_id) AS rank
          FROM sem_scored)
    WHERE rank <= 100
)
SELECT coalesce(bm.doc_id, sem.doc_id) AS doc_id,
       CAST(lex_rank AS BIGINT) AS lex_rank,
       CAST(sem_rank AS BIGINT) AS sem_rank,
       {sql_ieee_round(
           "coalesce(1.0 / (" + str(_RRF_K) + " + lex_rank), 0.0)"
           " + coalesce(1.0 / (" + str(_RRF_K) + " + sem_rank), 0.0)", 6)}
           AS rrf_score
FROM bm FULL OUTER JOIN sem ON bm.doc_id = sem.doc_id
ORDER BY rrf_score DESC, doc_id
LIMIT {_RRF_TOP}
"""


def ndcg_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 per probe query (vec_id < 5) of the exact cosine
    ranking, binary relevance = label equality with the query.

    DCG = Σ rel_i / log2(i+1) over the top-k; IDCG places all relevant
    docs first: Σ_{i≤min(R,k)} 1/log2(i+1) where R = corpus docs
    sharing the query's label (self excluded). Both sums are fixed-order
    sequential folds — engine-identical doubles."""
    emb = t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    queries = emb.filter(F.col("vec_id") < 5)
    topk = cosine_topk(emb, queries, k=_NDCG_K)
    q_lab = queries.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    n_lab = emb.groupBy("label").agg(F.count("*").alias("n_label"))
    dcg = (
        topk.join(F.broadcast(q_lab), "query_id")
        .join(
            emb.select(F.col("vec_id").alias("neighbor_id"), "label"),
            "neighbor_id",
        )
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(
                    F.col("label") == F.col("q_label"),
                    1.0 / F.log2(F.col("rank") + 1.0),
                ).otherwise(F.lit(0.0))
            ).alias("dcg")
        )
    )
    # R = same-label corpus docs excluding the query itself. LEFT join +
    # coalesce: a NULL-label query matches nothing (NULL = NULL is not
    # true) but must still appear with ndcg 0.0 — the DuckDB twin's
    # correlated count keeps it (count over an empty match set is 0, so
    # r_tot = −1); an inner join here silently dropped the row
    # (caught by the degenerate-embeddings sweep).
    r_tot = q_lab.join(
        F.broadcast(n_lab), F.col("q_label") == F.col("label"), "left"
    ).select(
        "query_id",
        (F.coalesce(F.col("n_label"), F.lit(0)) - 1).alias("r_tot"),
    )
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.least(F.col("r_tot"), F.lit(_NDCG_K))),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + 1.0),
    )
    return (
        dcg.join(r_tot, "query_id")
        .select(
            "query_id",
            ieee_round(
                F.when(F.col("r_tot") > 0, F.col("dcg") / idcg).otherwise(
                    F.lit(0.0)
                ),
                6,
            ).alias("ndcg"),
        )
        .orderBy("query_id")
    )


NDCG_LABEL_SQL = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v, {_NORM_N_SQL} AS n
           FROM embeddings WHERE embedding IS NOT NULL),
q AS (SELECT vec_id AS query_id, label AS q_label FROM e WHERE vec_id < 5),
scored AS (
    SELECT b.vec_id AS query_id, a.vec_id AS neighbor_id, a.label,
           {sql_ieee_round(_COS_SQL, 6)} AS cos
    FROM e a JOIN e b ON b.vec_id < 5 AND a.vec_id <> b.vec_id
),
topk AS (
    SELECT query_id, neighbor_id, label, rank
    FROM (SELECT query_id, neighbor_id, label, cos,
                 row_number() OVER (
                     PARTITION BY query_id ORDER BY cos DESC, neighbor_id
                 ) AS rank
          FROM scored)
    WHERE rank <= {_NDCG_K}
),
dcg AS (
    SELECT t.query_id,
           sum(CASE WHEN t.label = q.q_label
                    THEN 1.0 / log2(t.rank + 1.0) ELSE 0.0 END) AS dcg
    FROM topk t JOIN q ON t.query_id = q.query_id
    GROUP BY t.query_id
),
r_tot AS (
    SELECT q.query_id,
           (SELECT count(*) FROM e WHERE e.label = q.q_label) - 1 AS r_tot
    FROM q
)
SELECT d.query_id,
       {sql_ieee_round(
           "CASE WHEN r.r_tot > 0 THEN d.dcg / list_reduce("
           "list_transform(range(1, least(r.r_tot, " + str(_NDCG_K)
           + ") + 1), i -> 1.0 / log2(i + 1.0)), (x, y) -> x + y) "
           "ELSE 0.0 END", 6)} AS ndcg
FROM dcg d JOIN r_tot r ON d.query_id = r.query_id
ORDER BY d.query_id
"""


R6J_ENTRIES: dict[str, Entry] = {
    "rrf_fusion": Entry(rrf_fusion, RRF_FUSION_SQL),
    "ndcg_label_eval": Entry(ndcg_label_eval, NDCG_LABEL_SQL),
}
