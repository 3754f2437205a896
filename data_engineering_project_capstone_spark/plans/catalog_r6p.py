"""Round-6p catalog entries — model-eval and embedding QC readouts:

- ``langid_confusion``: confusion matrix of the stopword-overlap
  language identifier against the labeled ``lang`` column — the
  heuristic-classifier eval the lang-ID entry itself doesn't give.
  Reuses the EXACT prediction expression (and its DuckDB twin) from
  the ``text_lang_id`` entry, so the eval can never drift from the
  model it evaluates.
- ``embedding_norm_outliers``: embedding-corpus QC ledger — vector
  counts, NULL/zero-norm counts, mean/std of the L2 norm, and the
  count of >3σ norm outliers (the cheap screen that catches botched
  normalization or truncated embedding batches before they poison
  similarity search).

Norm folds reuse the parity-safe sequential-aggregate formulation;
the outlier threshold compares each norm against mean±3σ computed
from exact corpus-wide aggregates (identical doubles on both
engines — same inputs, same op order via sum/count/sum-of-squares).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from .catalog import Entry, sql_ieee_round, t
from .catalog import _text_lang_id_sql


def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(true_lang, pred_lang, n) confusion counts; NULL labels fold to
    'und' so the matrix is total. One narrow prediction map + one
    |langs|²-bounded aggregate."""
    from ..operators.text import lang_id

    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(
            F.coalesce(F.col("lang"), F.lit("und")).alias("true_lang"),
            lang_id("text").alias("pred_lang"),
        )
        .groupBy("true_lang", "pred_lang")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("true_lang", "pred_lang")
    )


LANGID_CONFUSION_SQL = f"""
WITH pred AS ({_text_lang_id_sql("lang")})
SELECT coalesce(lang, 'und') AS true_lang,
       lang_guess AS pred_lang,
       CAST(count(*) AS BIGINT) AS n
FROM pred
GROUP BY 1, 2
ORDER BY true_lang, pred_lang
"""


def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row embedding QC ledger: total rows, NULL vectors, zero-norm
    vectors, mean/std of the norm, and >3σ outlier count.

    Scale shape: one narrow norm map + two corpus aggregates (the
    second pass re-filters against the broadcast mean/std — a 1-row
    broadcast, not a self-join). std uses the population form
    sqrt(E[x²]−E[x]²) from exact sums so both engines derive the same
    double."""
    emb = t(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("embedding"), lambda x: x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    rows = emb.select(
        F.col("embedding").isNull().alias("is_null"),
        F.when(F.col("embedding").isNotNull(), norm).alias("n2"),
    )
    stats = rows.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("is_null").cast("long")).alias("n_null"),
        F.sum(F.when(F.col("n2") == 0.0, 1).otherwise(0)).alias("n_zero"),
        F.sum("n2").alias("s1"),
        F.sum(F.col("n2") * F.col("n2")).alias("s2"),
        F.sum(F.when(F.col("n2").isNotNull(), 1).otherwise(0)).alias("n_vec"),
    )
    mean = F.col("s1") / F.col("n_vec")
    # clamp: a unit-normalized corpus has variance ~0 and binary
    # rounding can land at -1e-16 — DuckDB sqrt() throws on negatives
    std = F.sqrt(F.greatest(F.col("s2") / F.col("n_vec") - mean * mean, F.lit(0.0)))
    out_cnt = (
        rows.crossJoin(F.broadcast(stats))
        .filter(
            F.col("n2").isNotNull()
            & (
                F.abs(F.col("n2") - F.col("s1") / F.col("n_vec"))
                > 3
                * F.sqrt(
                    F.greatest(
                        F.col("s2") / F.col("n_vec")
                        - (F.col("s1") / F.col("n_vec"))
                        * (F.col("s1") / F.col("n_vec")),
                        F.lit(0.0),
                    )
                )
            )
        )
        .agg(F.count("*").alias("n_outliers"))
    )
    return (
        stats.crossJoin(F.broadcast(out_cnt))
        .select(
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_null").cast("long").alias("n_null_vectors"),
            F.col("n_zero").cast("long").alias("n_zero_norm"),
            ieee_round(mean, 6).alias("mean_norm"),
            ieee_round(std, 6).alias("std_norm"),
            F.col("n_outliers").cast("long").alias("n_norm_outliers"),
        )
    )


EMB_NORM_QC_SQL = f"""
WITH rows_ AS (
    SELECT embedding IS NULL AS is_null,
           CASE WHEN embedding IS NOT NULL THEN
               sqrt(list_reduce(list_prepend(0.0,
                   list_transform(embedding::DOUBLE[], x -> x * x)),
                   (a, b) -> a + b))
           END AS n2
    FROM embeddings
),
stats AS (
    SELECT count(*) AS n_rows,
           sum(CASE WHEN is_null THEN 1 ELSE 0 END) AS n_null,
           sum(CASE WHEN n2 = 0.0 THEN 1 ELSE 0 END) AS n_zero,
           sum(n2) AS s1, sum(n2 * n2) AS s2,
           sum(CASE WHEN n2 IS NOT NULL THEN 1 ELSE 0 END) AS n_vec
    FROM rows_
),
outliers AS (
    SELECT count(*) AS n_outliers
    FROM rows_, stats
    WHERE n2 IS NOT NULL
      AND abs(n2 - s1 / n_vec)
          > 3 * sqrt(greatest(s2 / n_vec - (s1 / n_vec) * (s1 / n_vec), 0))
)
SELECT CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_null AS BIGINT) AS n_null_vectors,
       CAST(n_zero AS BIGINT) AS n_zero_norm,
       {sql_ieee_round("s1 / n_vec", 6)} AS mean_norm,
       {sql_ieee_round("sqrt(greatest(s2 / n_vec - (s1 / n_vec) * (s1 / n_vec), 0))", 6)}
           AS std_norm,
       CAST(n_outliers AS BIGINT) AS n_norm_outliers
FROM stats, outliers
"""


R6P_ENTRIES: dict[str, Entry] = {
    "langid_confusion": Entry(langid_confusion, LANGID_CONFUSION_SQL),
    "embedding_norm_outliers": Entry(
        embedding_norm_outliers, EMB_NORM_QC_SQL
    ),
}
