"""Round-6 catalog entries — corpus-statistics operators for training-data
curation, each the Spark-first expression of a published pipeline technique:

- ``kl_source_drift``: per-source KL divergence of the token distribution
  vs the whole corpus — the drift monitor run when a new crawl/source is
  admitted into a data mixture.
- ``dsir_importance``: Data Selection via Importance Resampling (Xie et
  al., 2023) — per-document average log-likelihood ratio between a target
  domain's unigram model and the raw-corpus model, with add-one
  smoothing; the score used to resample raw data toward a target domain.
- ``exact_substr_spans``: ExactSubstr-style duplicated-span profiling
  (Lee et al., "Deduplicating Training Data Makes Language Models
  Better", 2022) — the fraction of each document's tokens covered by a
  W-token window that appears verbatim in some other document. The
  reference implementation builds a corpus suffix array (inherently
  single-machine); the Spark-first re-expression hashes all W-token
  windows and joins on window hash, which distributes and catches the
  same ≥W-token verbatim overlaps.

Same contract as ``plans.catalog``: every entry is a PySpark plan paired
with DuckDB oracle SQL over the identical parquet, column names aliased
identically, floats rounded through the shared IEEE helper. Scale notes
sit on each entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from .catalog import Entry, sql_ieee_round, t
from .catalog_r5 import _SQL_TOKS, _toks

# ---------------------------------------------------------------------------
# 1. Per-source token-distribution drift (KL divergence)
# ---------------------------------------------------------------------------


def kl_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(P_source || P_corpus) over unigram distributions, per source.

    No smoothing needed: every source token is by construction in the
    corpus distribution, so q > 0 wherever p > 0.

    Scale: the explode feeds ONE (source, token) count shuffle that is
    map-side combined down to sources × vocab rows; everything after
    operates on vocab-sized data — corpus counts derive from the same
    aggregate (no second pass over the corpus), the corpus total is a
    broadcast scalar, and the final per-source sum is a sources-sized
    shuffle. Survives 1000 executors because nothing after the first
    combine is proportional to corpus size.
    """
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(_toks()).alias("tok")).filter(
        F.col("tok") != ""
    )
    src_cnt = tok.groupBy("source", "tok").agg(F.count("*").alias("c_st"))
    src_tot = src_cnt.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    corp_cnt = src_cnt.groupBy("tok").agg(F.sum("c_st").alias("c_t"))
    n_total = corp_cnt.agg(F.sum("c_t").alias("n")).select("n")
    p = F.col("c_st") / F.col("n_s")
    q = F.col("c_t") / F.col("n")
    return (
        src_cnt.join(F.broadcast(corp_cnt), "tok")
        .join(F.broadcast(src_tot), "source")
        .crossJoin(F.broadcast(n_total))
        .groupBy("source")
        .agg(
            F.sum("c_st").cast("long").alias("n_tokens"),
            # nano-quantized term fold (r12 fold discipline): each
            # p·ln(p/q) term is quantized to an exact 1e-9 integer
            # before the sum, so the vocab-sized fold is order-free and
            # a last-ulp libm difference can move the readout only if a
            # term sits within 1e-9/2 of a quantization edge AND the
            # sum within 1e-9 of the 4dp boundary — vs the raw double
            # sum's full fold-order sensitivity (the kmeans incident)
            ieee_round(
                F.sum(
                    F.round(p * F.log(p / q) * 1e9, 0).cast("long")
                )
                / 1e9,
                4,
            ).alias("kl_divergence"),
        )
        .orderBy("source")
    )


KL_SOURCE_DRIFT_SQL = rf"""
WITH tok AS (
    SELECT source, tok
    FROM (SELECT source, unnest({_SQL_TOKS}) AS tok FROM documents)
    WHERE tok <> ''
), src_cnt AS (
    SELECT source, tok, count(*) AS c_st FROM tok GROUP BY source, tok
), src_tot AS (
    SELECT source, sum(c_st) AS n_s FROM src_cnt GROUP BY source
), corp_cnt AS (
    SELECT tok, sum(c_st) AS c_t FROM src_cnt GROUP BY tok
), n AS (
    SELECT sum(c_t) AS n FROM corp_cnt
)
SELECT s.source,
       CAST(sum(s.c_st) AS BIGINT) AS n_tokens,
       {sql_ieee_round(
           "sum(CAST(round((s.c_st * 1.0 / st.n_s) "
           "* ln((s.c_st * 1.0 / st.n_s) / (c.c_t * 1.0 / n.n)) "
           "* 1000000000) AS BIGINT)) / 1000000000.0",
           4,
       )} AS kl_divergence
FROM src_cnt s
JOIN corp_cnt c USING (tok)
JOIN src_tot st USING (source)
CROSS JOIN n
GROUP BY s.source
ORDER BY s.source
"""


# ---------------------------------------------------------------------------
# 2. DSIR importance weights
# ---------------------------------------------------------------------------


def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document importance weight for resampling the raw corpus
    toward a target domain (here: lang = 'en' documents), DSIR-style:
    weight = mean over the doc's tokens of
    ln(p_target(tok) / p_raw(tok)), both unigram models add-one
    smoothed over the raw vocabulary (so tokens unseen in the target
    get a finite negative ratio; raw covers every token by
    construction).

    Scale: two vocab-sized count shuffles (target counts derive from
    the same exploded pass with a conditional sum — one corpus read);
    the per-token log-ratio table is vocab-sized and BROADCAST onto the
    exploded tokens, so scoring is map-side; the per-doc mean is one
    doc-keyed shuffle. At 100 TB the vocab table is the only state that
    must fit in memory — millions of rows, comfortably broadcastable;
    a trillion-token vocab would swap the broadcast for a shuffle join
    without changing semantics.

    r19: cnt is CUT (one-shot localCheckpoint at the vocab-sized
    representation) — tot and ratio prune it differently, so without
    the cut each re-derives the whole corpus explode+count (3 documents
    scans per run measured; interleaved A/B min 0.875s cut vs 0.93s
    old). The two remaining corpus passes (count pass, scoring pass)
    are the operator's fundamental shape. spread_scan was MEASURED and
    REJECTED here (interleaved min 1.36s): tok feeds two
    differently-pruned consumers, so the round-robin exchange
    duplicates instead of reusing — the simjoin_prefix r18 lesson.
    """
    docs = t(spark, sf_dir, "documents")
    # eqNullSafe: a NULL lang is NOT the target (the SQL CASE yields 0).
    # Plain == gives NULL, and a token seen ONLY in NULL-lang docs then
    # sums c_tgt to NULL -> NULL log-ratio -> silently shorter per-doc
    # average. Caught by the degenerate-docs net.
    tok = docs.select(
        "doc_id",
        F.col("lang").eqNullSafe(F.lit("en")).alias("is_target"),
        F.explode(_toks()).alias("tok"),
    ).filter(F.col("tok") != "")
    cnt = tok.groupBy("tok").agg(
        F.count("*").alias("c_raw"),
        F.sum(F.col("is_target").cast("long")).alias("c_tgt"),
    ).localCheckpoint()  # one-shot: tot + ratio consumers of the vocab table
    tot = cnt.agg(
        F.sum("c_raw").alias("n_raw"),
        F.sum("c_tgt").alias("n_tgt"),
        F.count("*").alias("v"),
    )
    ratio = (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "tok",
            F.log(
                ((F.col("c_tgt") + 1) / (F.col("n_tgt") + F.col("v")))
                / ((F.col("c_raw") + 1) / (F.col("n_raw") + F.col("v")))
            ).alias("log_ratio"),
        )
    )
    # per-token log-ratios quantized to exact 1e-9 integers in the
    # broadcast table (r12 fold discipline): the per-doc mean is then an
    # order-free integer sum over both engines' identical values, and a
    # last-ulp ln() difference can only matter within 5e-10 of an edge
    ratio = ratio.select(
        "tok", F.round(F.col("log_ratio") * 1e9, 0).cast("long").alias("lr9")
    )
    return (
        tok.join(F.broadcast(ratio), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            ieee_round(
                F.sum("lr9") / F.count("*") / 1e9, 4
            ).alias("dsir_weight"),
        )
        .orderBy("doc_id")
    )


DSIR_IMPORTANCE_SQL = rf"""
WITH tok AS (
    SELECT doc_id, is_target, tok
    FROM (
        SELECT doc_id, lang = 'en' AS is_target, unnest({_SQL_TOKS}) AS tok
        FROM documents
    )
    WHERE tok <> ''
), cnt AS (
    SELECT tok, count(*) AS c_raw,
           sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS c_tgt
    FROM tok GROUP BY tok
), tot AS (
    SELECT sum(c_raw) AS n_raw, sum(c_tgt) AS n_tgt, count(*) AS v FROM cnt
), ratio AS (
    SELECT tok,
           CAST(round(ln(((c_tgt + 1) * 1.0 / (n_tgt + v))
                         / ((c_raw + 1) * 1.0 / (n_raw + v)))
                      * 1000000000) AS BIGINT) AS lr9
    FROM cnt CROSS JOIN tot
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       {sql_ieee_round(
           "sum(r.lr9) * 1.0 / count(*) / 1000000000.0", 4
       )} AS dsir_weight
FROM tok t JOIN ratio r USING (tok)
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


# ---------------------------------------------------------------------------
# 3. ExactSubstr duplicated-span profiling
# ---------------------------------------------------------------------------

_W = 20  # window length in tokens (the paper uses 50 BPE tokens; the
# synthetic docs are ~100 whitespace tokens, so 20 keeps the entry
# meaningful at test scale — the plan is length-agnostic)


def exact_substr_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of each doc's tokens covered by some W-token window that
    appears verbatim in at least one OTHER document.

    Plan shape (the suffix-array-free distributed form):
    1. per doc, hash every W-token sliding window (md5 so both engines
       agree) — a per-row expression over the materialized token array;
    2. ONE shuffle groups window hashes; hashes spanning ≥2 distinct
       docs are the duplicated windows (map-side combine applies);
    3. covered token positions = union of [start, start+W) per doc over
       its duplicated windows — explode + distinct on (doc, pos), a
       doc-keyed shuffle bounded by doc length × dup windows;
    4. left join back to per-doc token counts for the fraction.

    Scale: never corpus-quadratic — step 2's group is vocab-of-windows
    sized and a hot window (boilerplate repeated everywhere) costs its
    own group only; step 3 is bounded per doc by W × windows-per-doc.
    The md5 window strings never leave stage 1: only 16-byte hashes ride
    the shuffle.
    """
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(F.col("doc_id"), _toks().alias("toks"))
    starts = F.when(
        F.size("toks") >= _W, F.sequence(F.lit(1), F.size("toks") - F.lit(_W - 1))
    ).otherwise(F.array().cast("array<int>"))
    wins = tok.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.explode(
            F.transform(
                starts,
                lambda i: F.struct(
                    i.alias("start"),
                    F.md5(F.concat_ws(" ", F.slice("toks", i, _W))).alias("h"),
                ),
            )
        ).alias("w"),
    ).select("doc_id", "n_tokens", F.col("w.start").alias("start"), F.col("w.h").alias("h"))
    dup_h = (
        wins.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    covered = (
        wins.join(dup_h, "h")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + F.lit(_W - 1))
            ).alias("pos"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_dup_tokens"))
    )
    return (
        tok.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
        .join(covered, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_tokens", F.lit(0)).cast("long").alias("n_dup_tokens"),
            ieee_round(
                F.coalesce("n_dup_tokens", F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
                4,
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


EXACT_SUBSTR_SQL = rf"""
WITH tok AS (
    SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), win AS (
    SELECT doc_id, i AS start,
           md5(array_to_string(toks[i:i+{_W - 1}], ' ')) AS h
    FROM tok, unnest(range(1, greatest(len(toks) - {_W - 1}, 0) + 1)) AS r(i)
), dup_h AS (
    SELECT h FROM win GROUP BY h HAVING count(DISTINCT doc_id) >= 2
), covered AS (
    SELECT doc_id, count(*) AS n_dup_tokens
    FROM (
        SELECT DISTINCT w.doc_id, p.pos
        FROM win w JOIN dup_h USING (h),
             unnest(range(w.start, w.start + {_W})) AS p(pos)
    )
    GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(coalesce(c.n_dup_tokens, 0) AS BIGINT) AS n_dup_tokens,
       {sql_ieee_round(
           "coalesce(c.n_dup_tokens, 0) * 1.0 / greatest(len(t.toks), 1)", 4
       )} AS dup_frac
FROM tok t LEFT JOIN covered c USING (doc_id)
ORDER BY t.doc_id
"""


# ---------------------------------------------------------------------------
# 4. End-to-end curation pipeline (composite)
# ---------------------------------------------------------------------------


def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-curation chain as ONE dataflow — the composability
    proof that the catalog's stages snap together without materialization
    barriers:

    1. quality gates (Gopher-style word-count / mean-word-length /
       duplicate-word-fraction keeps);
    2. exact dedup, BEST-wins: one survivor per content fingerprint,
       highest quality score (doc_id tiebreak) — not first-wins, so the
       dedup pass actively improves the corpus;
    3. deterministic per-lang quota (first 200 docs in md5(doc_id)
       hash order — reproducible across reruns, cluster sizes, and row
       order);
    4. mixture report: per (lang, source) doc and token counts.

    Scale: stages 1-2 are a narrow map + one fingerprint-keyed window;
    stage 3 is a per-lang window over already-gated survivors; stage 4 a
    strata-sized agg. Catalyst pipelines all four into ~three shuffles
    total; nothing materializes between stages.

    NULL policy (random-docs fuzz, r9): keyless docs are excluded on
    both engines — doc_id is the dedup tiebreak AND the quota order
    key (md5 of a NULL id is NULL, so every keyless doc ties), and the
    engines place NULLs on opposite ends of an ascending sort, which
    flips dedup survivors (and their lang/source attribution in the
    mixture report). Same discipline as shard_balance.
    """
    from ..operators.text import quality_score, token_count

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())
    txt = F.coalesce(F.col("text"), F.lit(""))
    words = F.split(F.trim(txt), r"\s+")
    n_words = F.size(words).cast("long")
    mean_wl = F.length(F.regexp_replace(txt, r"\s+", "")) / n_words
    dup_frac = 1.0 - F.size(F.array_distinct(words)) / n_words.cast("double")
    gated = docs.filter(
        (n_words >= 20) & (mean_wl >= 2.0) & (mean_wl <= 10.0) & (dup_frac <= 0.8)
    ).select(
        "doc_id",
        "lang",
        "source",
        F.md5(F.lower(F.trim(txt))).alias("fp"),
        quality_score(txt).alias("q"),
        token_count(txt).alias("n_tok"),
    )
    from pyspark.sql import Window

    best = F.row_number().over(
        Window.partitionBy("fp").orderBy(F.desc("q"), "doc_id")
    )
    deduped = gated.withColumn("_rn", best).filter(F.col("_rn") == 1).drop("_rn")
    quota = F.row_number().over(
        Window.partitionBy("lang").orderBy(
            F.md5(F.col("doc_id").cast("string")), "doc_id"
        )
    )
    sampled = deduped.withColumn("_qn", quota).filter(F.col("_qn") <= 200)
    return (
        sampled.groupBy("lang", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
        )
        .orderBy("lang", "source")
    )


CURATION_PIPELINE_SQL = rf"""
WITH gated AS (
    SELECT doc_id, lang, source,
           md5(lower(trim(coalesce(text, '')))) AS fp,
           {sql_ieee_round(
               "0.4 * least(len(" + _SQL_TOKS + ") / 200.0, 1.0) "
               "+ 0.3 * (CASE WHEN length(coalesce(text, '')) > 0 THEN "
               "length(regexp_replace(coalesce(text, ''), '[^A-Za-z]', '', 'g')) "
               "* 1.0 / length(coalesce(text, '')) ELSE 0.0 END) "
               "+ 0.3 * (CASE WHEN len(" + _SQL_TOKS + ") > 0 THEN "
               "len(list_distinct(" + _SQL_TOKS + ")) * 1.0 "
               "/ len(" + _SQL_TOKS + ") ELSE 0.0 END)",
               4,
           )} AS q,
           len(string_split_regex(trim(coalesce(text, '')), '[ \t\n\x0b\f\r]+')) AS n_tok
    FROM documents
    WHERE doc_id IS NOT NULL
      AND len(string_split_regex(trim(coalesce(text, '')), '[ \t\n\x0b\f\r]+')) >= 20
      AND length(regexp_replace(coalesce(text, ''), '[ \t\n\x0b\f\r]+', '', 'g')) * 1.0
          / len(string_split_regex(trim(coalesce(text, '')), '[ \t\n\x0b\f\r]+'))
          BETWEEN 2.0 AND 10.0
      AND 1.0 - len(list_distinct(string_split_regex(trim(coalesce(text, '')), '[ \t\n\x0b\f\r]+')))
          * 1.0 / len(string_split_regex(trim(coalesce(text, '')), '[ \t\n\x0b\f\r]+')) <= 0.8
), deduped AS (
    SELECT * FROM (
        SELECT gated.*,
               row_number() OVER (PARTITION BY fp ORDER BY q DESC, doc_id) AS rn
        FROM gated
    ) WHERE rn = 1
), sampled AS (
    SELECT * FROM (
        SELECT deduped.*,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS qn
        FROM deduped
    ) WHERE qn <= 200
)
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens
FROM sampled
GROUP BY lang, source
ORDER BY lang, source
"""


R6_ENTRIES: dict[str, Entry] = {
    "kl_source_drift": Entry(kl_source_drift, KL_SOURCE_DRIFT_SQL),
    "dsir_importance": Entry(dsir_importance, DSIR_IMPORTANCE_SQL),
    "exact_substr_spans": Entry(exact_substr_spans, EXACT_SUBSTR_SQL),
    "curation_pipeline": Entry(curation_pipeline, CURATION_PIPELINE_SQL),
}
