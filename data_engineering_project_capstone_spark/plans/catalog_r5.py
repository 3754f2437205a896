"""Round-5 catalog entries — deeper LLM-data-pipeline surface.

Same contract as ``plans.catalog``: every entry is a PySpark plan paired
with DuckDB oracle SQL over the identical parquet, column names aliased
identically on both sides, floats rounded through the shared IEEE helper
before hashing. See the ``catalog`` module docstring for the full
cross-engine parity rules.

Families added here (all on the driver-provided ``documents`` /
``embeddings`` / ``lineitem`` tables):

- intra-doc repetition removal (``text_dedup_tokens``)
- cross-doc duplicate-passage detection (``dup_passage_docs``)
- collocation mining via PMI (``token_bigram_pmi``)
- BM25 retrieval scoring (``bm25_scores``)
- exact length quantiles (``doc_length_percentiles``)
- incremental corpus dedup (``dedup_incremental``)
- fixed-quota deterministic sampling (``sample_hash_quota``)
- skew-salted aggregation (``skew_salted_agg``)
- curriculum quality bucketing (``quality_curriculum``)
- int8 embedding quantization error (``embedding_quantize``)

Scale notes sit on each entry: where the shuffle is, what broadcasts,
why the plan survives 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from .catalog import Entry, sql_ieee_round, t

def _toks():
    """Whitespace tokens of the lowercased doc text. Built lazily — Column
    construction needs an active SparkContext, which doesn't exist at
    import time.

    NULL policy (engine-wide, see tests/test_degenerate_docs.py): NULL
    text tokenizes as the empty string. Without the coalesce the engines
    diverge structurally — Spark keeps a NULL-token-array row in per-row
    plans while DuckDB's ``unnest(NULL)`` silently drops the document."""
    return F.split(
        F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))), r"\s+"
    )


_SQL_TOKS = r"string_split_regex(lower(trim(coalesce(text, ''))), '[ \t\n\x0b\f\r]+')"


# ---------------------------------------------------------------------------
# 1. Intra-document repetition removal
# ---------------------------------------------------------------------------


def text_dedup_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc token dedup keeping first occurrence order — the
    cheapest self-repetition cleaner (drops looped boilerplate tokens
    before expensive cross-doc dedup).

    Scale: ``array_distinct`` is a pure per-row expression — zero
    shuffle, trivially parallel at any corpus size. Spark's
    ``array_distinct`` keeps first-occurrence order by contract; the
    oracle reconstructs the same order explicitly (min position per
    token) rather than trusting DuckDB's ``list_distinct`` ordering.
    """
    docs = t(spark, sf_dir, "documents")
    deduped = F.array_distinct(_toks())
    return docs.select(
        "doc_id",
        F.size(_toks()).cast("long").alias("n_tokens"),
        F.size(deduped).cast("long").alias("n_unique"),
        F.concat_ws(" ", deduped).alias("dedup_text"),
    ).orderBy("doc_id")


TEXT_DEDUP_TOKENS_SQL = rf"""
-- per-row like the Spark form: the old unnest/regroup shape re-joined
-- on doc_id, which silently dropped NULL-id docs the per-row
-- array_distinct keeps (caught by the degenerate-docs net). The
-- indexed lambda keeps exactly the first occurrence of each token —
-- list_position returns the FIRST index, so x survives iff it IS the
-- first occurrence, preserving order by construction.
WITH ded AS (
    SELECT doc_id, toks,
           list_filter(toks, (x, i) -> list_position(toks, x) = i) AS dd
    FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(dd) AS BIGINT) AS n_unique,
       array_to_string(dd, ' ') AS dedup_text
FROM ded
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# 2. Cross-document duplicate-passage detection
# ---------------------------------------------------------------------------


def dup_passage_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc fraction of its distinct 5-gram shingles that also occur
    in at least one OTHER document — the passage-level contamination
    score used to catch boilerplate/templated text that exact and
    near-dup doc-level passes both miss.

    Scale: explode distinct shingles per doc (corpus-linear), ONE
    shuffle keyed by shingle with a whole-partition count window (no
    count-table re-join — that shape computes the explode twice and
    shuffles three times; measured 2.5× slower), then a per-doc re-agg.
    Shingle-key skew is bounded because only *distinct* per-doc shingles
    are emitted — a shingle's partition receives at most one row per
    containing doc; a truly viral shingle (boilerplate in millions of
    docs) hot-spots the window partition exactly as it would the
    groupBy, and gets handled the same way (cap or pre-filter by a
    sampled document-frequency list).

    NULL policy (random-docs fuzz, r9): keyless docs are excluded on
    both engines — doc_id is the per-doc ledger identity, and grouping
    NULL ids merges every keyless doc into one phantom "document"
    whose shingle counts then depend on engine-specific dedup shape
    (the oracle's SELECT DISTINCT dedups shingles across the merged
    group; the Spark form counts per-row distinct shingles). Same
    discipline as shard_balance.

    Duplicate-id policy (alldup corpus, r11): doc_id is the OUTPUT
    identity, so multiple physical rows sharing an id are one document
    — their shingle sets union. Without the `.distinct()` on
    (doc_id, shingle) below, k copies of a doc emit k rows per shingle,
    the window counts k > 1, and every shingle of a duplicated doc
    reads "shared" while the oracle's SELECT DISTINCT collapses the
    copies (r10's one red test). The distinct costs one extra hash
    aggregate, but its map-side combine is near-free on real corpora:
    shingles are already array_distinct per row, so pre-shuffle
    duplicates exist only where ids are actually duplicated.
    """
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())
    # materialize the token array ONCE: referencing the split inside the
    # transform lambda re-evaluates it per element (O(tokens²) per doc)
    tok = docs.select("doc_id", _toks().alias("toks"))
    starts = F.sequence(F.lit(1), F.greatest(F.size("toks") - F.lit(4), F.lit(1)))
    grams = F.array_distinct(
        F.transform(starts, lambda i: F.concat_ws(" ", F.slice("toks", i, 5)))
    )
    pairs = tok.select("doc_id", F.explode(grams).alias("shingle")).distinct()
    n_with = F.count("*").over(Window.partitionBy("shingle"))
    return (
        pairs.withColumn("n_docs_with", n_with)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("n_docs_with") > 1, 1).otherwise(0)).alias("n_shared"),
        )
        .select(
            "doc_id",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.col("n_shared").cast("long").alias("n_shared"),
            ieee_round(F.col("n_shared") / F.col("n_shingles"), 4).alias("shared_frac"),
        )
        .orderBy("doc_id")
    )


DUP_PASSAGE_SQL = rf"""
WITH tok AS (
    SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
    WHERE doc_id IS NOT NULL
), g AS (
    SELECT DISTINCT doc_id,
           unnest(list_transform(
               range(1, greatest(len(toks) - 4, 1) + 1),
               i -> array_to_string(toks[i:i+4], ' '))) AS shingle
    FROM tok
), c AS (
    SELECT shingle, count(*) AS n_docs_with FROM g GROUP BY shingle
)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN c.n_docs_with > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       {sql_ieee_round('sum(CASE WHEN c.n_docs_with > 1 THEN 1 ELSE 0 END) * 1.0 / count(*)', 4)} AS shared_frac
FROM g JOIN c USING (shingle)
GROUP BY g.doc_id
ORDER BY g.doc_id
"""


# ---------------------------------------------------------------------------
# 3. Collocation mining (pointwise mutual information)
# ---------------------------------------------------------------------------


def token_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 word bigrams by PMI (min count 5) — standard collocation
    mining for tokenizer/vocab construction. PMI =
    ln(c_xy · N / (c_x · c_y)) with N = total unigram count.

    Scale: one unigram-count shuffle + one bigram-count shuffle, both
    map-side combined to vocab-sized outputs; unigram table broadcast
    twice onto the bigram counts (vocab ≪ corpus). Top-k is
    orderBy+limit = per-partition heaps, no global window.
    """
    docs = t(spark, sf_dir, "documents")
    # token array materialized once (see dup_passage_docs note)
    tok = docs.select(_toks().alias("toks"))
    uni = (
        tok.select(F.explode("toks").alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("c_tok"))
    )
    n_total = uni.agg(F.sum("c_tok").alias("n")).select("n")
    starts = F.sequence(F.lit(1), F.greatest(F.size("toks") - F.lit(1), F.lit(1)))
    # try_element_at, not element_at: ANSI mode (default in Spark 4) makes
    # element_at THROW on out-of-bounds, and a 1-token doc yields
    # starts=[1] with toks[2] unset. try_element_at returns NULL there,
    # which the w2 <> '' filter drops — exactly what the DuckDB twin does
    # (toks[i+1] out of range is NULL in DuckDB).
    grams = F.transform(
        starts, lambda i: F.struct(F.try_element_at("toks", i).alias("w1"),
                                   F.try_element_at("toks", i + 1).alias("w2"))
    )
    big = (
        tok.select(F.explode(grams).alias("g"))
        .select(F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c_xy"))
        .filter(F.col("c_xy") >= 5)
    )
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c_tok").alias("c_x"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c_tok").alias("c_y"))
    return (
        big.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(n_total))
        .select(
            "w1",
            "w2",
            F.col("c_xy").cast("long").alias("c_xy"),
            ieee_round(
                F.log(F.col("c_xy") * F.col("n") / (F.col("c_x") * F.col("c_y"))), 4
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(50)
    )


TOKEN_BIGRAM_PMI_SQL = rf"""
WITH tok AS (
    SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), uni AS (
    SELECT tok, count(*) AS c_tok
    FROM (SELECT unnest(toks) AS tok FROM tok) WHERE tok <> ''
    GROUP BY tok
), n AS (
    SELECT sum(c_tok) AS n FROM uni
), big AS (
    SELECT w1, w2, count(*) AS c_xy
    FROM (
        SELECT toks[i] AS w1, toks[i+1] AS w2
        FROM tok, unnest(range(1, greatest(len(toks) - 1, 1) + 1)) AS r(i)
    )
    WHERE w1 <> '' AND w2 <> ''
    GROUP BY w1, w2
    HAVING count(*) >= 5
)
SELECT w1, w2, CAST(c_xy AS BIGINT) AS c_xy,
       {sql_ieee_round('ln(c_xy * n.n / (ux.c_tok * uy.c_tok))', 4)} AS pmi
FROM big
JOIN uni ux ON big.w1 = ux.tok
JOIN uni uy ON big.w2 = uy.tok
CROSS JOIN n
ORDER BY pmi DESC, w1, w2
LIMIT 50
"""


# ---------------------------------------------------------------------------
# 4. BM25 retrieval scoring
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "table", "hash")
_BM25_K1 = 1.2
_BM25_B = 0.75


def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) of a fixed 3-term query over every doc,
    top-100 by score — the retrieval-scoring primitive behind
    quality-targeted data selection.

    Scale: per-doc term frequencies are pure array expressions (zero
    shuffle); document frequencies and avg doc length are two tiny aggs
    broadcast back. The only corpus-sized shuffle is the final top-k,
    which is orderBy+limit (per-partition heaps).
    """
    docs = t(spark, sf_dir, "documents")
    dl = F.size(_toks()).cast("double")
    base = docs.select("doc_id", _toks().alias("toks"), dl.alias("dl"))
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(
                F.when(F.array_contains("toks", term), 1).otherwise(0)
            ).alias(f"df_{i}")
            for i, term in enumerate(_BM25_TERMS)
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i, term in enumerate(_BM25_TERMS):
        tf = F.size(F.filter("toks", lambda x: x == F.lit(term))).cast("double")
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5) + 1.0
        )
        denom = tf + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        score = score + idf * tf * (_BM25_K1 + 1.0) / denom
    return (
        scored.select("doc_id", ieee_round(score, 4).alias("bm25"))
        .filter(F.col("bm25") > 0.0)
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(100)
    )


def _bm25_sql() -> str:
    terms_sql = []
    for i, term in enumerate(_BM25_TERMS):
        tf = f"len(list_filter(toks, x -> x = '{term}'))"
        idf = f"ln((s.n_docs - s.df_{i} + 0.5) / (s.df_{i} + 0.5) + 1.0)"
        denom = f"({tf} + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * b.dl / s.avgdl))"
        terms_sql.append(f"{idf} * {tf} * ({_BM25_K1} + 1.0) / {denom}")
    score = " + ".join(terms_sql)
    dfs = ",\n           ".join(
        f"sum(CASE WHEN list_contains(toks, '{term}') THEN 1 ELSE 0 END) AS df_{i}"
        for i, term in enumerate(_BM25_TERMS)
    )
    return rf"""
WITH b AS (
    SELECT doc_id, {_SQL_TOKS} AS toks,
           CAST(len({_SQL_TOKS}) AS DOUBLE) AS dl
    FROM documents
), s AS (
    SELECT count(*) AS n_docs, avg(dl) AS avgdl,
           {dfs}
    FROM b
)
SELECT doc_id, {sql_ieee_round(score, 4)} AS bm25
FROM b CROSS JOIN s
WHERE {sql_ieee_round(score, 4)} > 0.0
ORDER BY bm25 DESC, doc_id
LIMIT 100
"""


BM25_SCORES_SQL = _bm25_sql()


# ---------------------------------------------------------------------------
# 5. Exact length quantiles per stratum
# ---------------------------------------------------------------------------


def doc_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated length quantiles per (lang, source) — the
    corpus profile that sizes packing windows and truncation budgets.
    Spark ``percentile`` and DuckDB ``quantile_cont`` share the same
    linear-interpolation definition, so this is a true cross-engine
    check of the sort-based exact-percentile path.

    Scale: one shuffle keyed by the (small) stratum set; exact
    percentile sorts within each stratum — at 100 TB swap to
    ``approx_percentile`` (entry ``agg_approx`` covers that path).
    """
    docs = t(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            *[
                ieee_round(F.expr(f"percentile(n_chars, {q})"), 2).alias(
                    f"p{int(q * 100):02d}"
                )
                for q in (0.25, 0.5, 0.75, 0.99)
            ],
        )
        .orderBy("lang", "source")
    )


DOC_LENGTH_PCT_SQL = f"""
SELECT lang, source, count(*) AS n_docs,
       {sql_ieee_round('quantile_cont(n_chars, 0.25)', 2)} AS p25,
       {sql_ieee_round('quantile_cont(n_chars, 0.50)', 2)} AS p50,
       {sql_ieee_round('quantile_cont(n_chars, 0.75)', 2)} AS p75,
       {sql_ieee_round('quantile_cont(n_chars, 0.99)', 2)} AS p99
FROM documents
GROUP BY lang, source
ORDER BY lang, source
"""


# ---------------------------------------------------------------------------
# 6. Incremental corpus dedup
# ---------------------------------------------------------------------------


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: docs from sources other than
    ``src0`` (the "already-ingested corpus") are kept only if their
    content fingerprint is unseen — the anti-join every rolling crawl
    pipeline runs per batch. Reports kept/dropped per new source.

    Scale: fingerprint anti-join is one hash shuffle on md5(coalesce(text, '')) —
    or, when the new batch ≪ corpus, flip the build side so the batch
    broadcasts. Fingerprints (not full text) move through the shuffle.
    """
    docs = t(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))))
    existing = docs.filter(F.col("source") == "src0").select(fp.alias("fp")).distinct()
    new = docs.filter(F.col("source") != "src0").select("doc_id", "source", fp.alias("fp"))
    kept = new.join(existing, "fp", "left_anti")
    return (
        new.select("source", "doc_id")
        .groupBy("source")
        .agg(F.count("*").alias("n_new"))
        .join(
            kept.groupBy("source").agg(F.count("*").alias("n_kept")),
            "source",
            "left",
        )
        .select(
            "source",
            "n_new",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (F.col("n_new") - F.coalesce("n_kept", F.lit(0))).alias("n_dropped"),
        )
        .orderBy("source")
    )


DEDUP_INCREMENTAL_SQL = """
WITH existing AS (
    SELECT DISTINCT md5(lower(trim(coalesce(text, '')))) AS fp FROM documents WHERE source = 'src0'
), new AS (
    SELECT doc_id, source, md5(lower(trim(coalesce(text, '')))) AS fp
    FROM documents WHERE source <> 'src0'
), kept AS (
    -- NOT EXISTS, not NOT IN: if text is ever NULL the fingerprint is
    -- NULL, and NOT IN's three-valued logic would drop EVERY row while
    -- the Spark side's left_anti join keeps NULL-fp rows. NOT EXISTS
    -- with an equality predicate has exactly anti-join semantics.
    SELECT source, count(*) AS n_kept
    FROM new
    WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.fp = new.fp)
    GROUP BY source
)
SELECT n.source, count(*) AS n_new,
       CAST(coalesce(any_value(k.n_kept), 0) AS BIGINT) AS n_kept,
       CAST(count(*) - coalesce(any_value(k.n_kept), 0) AS BIGINT) AS n_dropped
FROM new n LEFT JOIN kept k ON n.source = k.source
GROUP BY n.source
ORDER BY n.source
"""


# ---------------------------------------------------------------------------
# 7. Fixed-quota deterministic sampling
# ---------------------------------------------------------------------------


def sample_hash_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum sampling, deterministic: rank docs inside
    each lang by md5(doc_id) (a uniform pseudo-random but reproducible
    order) and keep the first 100. The fixed-quota complement of the
    fraction-based ``sample_stratified``.

    Scale: rank-within-stratum is a window per lang; with few large
    strata this is the two-phase salted top-k problem — ``topk_per_group``
    demonstrates the scale-out variant; here strata counts (≫ k) keep
    the per-partition heap path adequate.
    """
    docs = t(spark, sf_dir, "documents")
    # NULLS LAST + content tiebreak: a NULL doc_id hashes to NULL, and
    # the engines default its sort position oppositely (Spark NULLS
    # FIRST vs DuckDB NULLS LAST) — which would shift every rank in the
    # stratum; md5(text) totalizes the order between NULL-id docs.
    # No-op on clean data (unique non-null ids). Degenerate-docs net.
    rk = F.row_number().over(
        Window.partitionBy("lang").orderBy(
            F.asc_nulls_last(F.md5(F.col("doc_id").cast("string"))),
            F.asc_nulls_last("doc_id"),
            F.md5(F.coalesce(F.col("text"), F.lit(""))),
        )
    )
    return (
        docs.select("doc_id", "lang", rk.alias("rk"))
        .filter(F.col("rk") <= 100)
        .select("doc_id", "lang", F.col("rk").cast("long").alias("rk"))
        .orderBy("lang", "rk")
    )


SAMPLE_HASH_QUOTA_SQL = """
WITH ranked AS (
    SELECT doc_id, lang,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)) NULLS LAST,
                        doc_id NULLS LAST,
                        md5(coalesce(text, ''))
           ) AS rk
    FROM documents
)
SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 100
ORDER BY lang, rk
"""


# ---------------------------------------------------------------------------
# 8. Skew-salted aggregation
# ---------------------------------------------------------------------------


def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a 3-value hot key
    (l_returnflag holds 600k rows in 3 groups): phase 1 aggregates on
    (key, salt-16) so every core works, phase 2 folds the 48 partials.
    Counts are bit-identical to the direct group-by; the double sums are
    value-identical AFTER the entry's 2dp rounding (two-phase summation
    order differs from the direct fold, so raw doubles can differ in
    the last ulps). The oracle runs the direct form.

    Scale: this is THE pattern for power-law keys — phase-1 shuffle
    fans the hot key across 16 partitions; phase-2 shuffle moves only
    key-cardinality × 16 rows. AQE skew handling covers joins; salting
    covers aggs like this where one key dominates.
    """
    li = t(spark, sf_dir, "lineitem")
    salt = F.pmod(F.hash("l_orderkey"), F.lit(16))
    # exact integer folds (q1_pricing_summary idiom, applied r12): raw
    # double sums of qty/revenue are fold-order-sensitive and can land
    # on a rounding boundary where the engines' partial-agg orders
    # disagree (the kmeans_embeddings incident); centi-quantity and
    # revenue units fold exactly on both engines instead
    qty_c = F.round(F.col("l_quantity") * 100, 0).cast("long")
    rev_u = (
        F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100, 0).cast("long"))
    ).cast("decimal(38,0)")
    partial = (
        li.groupBy("l_returnflag", salt.alias("salt"))
        .agg(
            F.count("*").alias("pn"),
            F.sum(qty_c).alias("pq"),
            F.sum(rev_u).alias("prev"),
        )
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.sum("pn").cast("long").alias("n_rows"),
            ieee_round(F.sum("pq") / 100.0, 2).alias("sum_qty"),
            ieee_round(F.sum("prev") / 10000.0, 2).alias("sum_revenue"),
        )
        .orderBy("l_returnflag")
    )


SKEW_SALTED_AGG_SQL = f"""
SELECT l_returnflag,
       count(*) AS n_rows,
       {sql_ieee_round(
           'sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0', 2)}
           AS sum_qty,
       {sql_ieee_round(
           'sum(CAST(round(l_extendedprice * 100) AS BIGINT)'
           ' * (100 - CAST(round(l_discount * 100) AS BIGINT)))'
           ' / 10000.0', 2)} AS sum_revenue
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# 9. Curriculum quality bucketing
# ---------------------------------------------------------------------------


def quality_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score → ntile(4) curriculum buckets per lang →
    per-bucket profile. Score blends length saturation, bigram
    non-repetition and mean word length — the shape (not the weights)
    of every quality-curriculum sampler.

    Scale: score is a pure per-row expression; ntile needs a per-lang
    sort — with few large strata, swap ntile for percentile-threshold
    buckets (stats-then-apply, see ``clip_outliers``) to avoid the
    global per-stratum sort. Final agg is bucket-sized.
    """
    docs = t(spark, sf_dir, "documents")
    # token array materialized once (see dup_passage_docs note)
    tok = docs.select("doc_id", "lang", "text", _toks().alias("toks"))
    n_tok = F.size("toks").cast("double")
    starts = F.sequence(F.lit(1), F.greatest(F.size("toks") - F.lit(1), F.lit(1)))
    grams = F.transform(starts, lambda i: F.concat_ws(" ", F.slice("toks", i, 2)))
    dup_frac = 1.0 - F.size(F.array_distinct(grams)) / F.greatest(
        F.size(grams).cast("double"), F.lit(1.0)
    )
    mean_wlen = (F.length(F.regexp_replace(F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))), r"\s+", ""))
                 / F.greatest(n_tok, F.lit(1.0)))
    score = ieee_round(
        0.5 * F.least(n_tok / 100.0, F.lit(1.0))
        + 0.3 * (1.0 - dup_frac)
        + 0.2 * F.least(mean_wlen / 8.0, F.lit(1.0)),
        6,
    )
    scored = tok.select("doc_id", "lang", score.alias("score"))
    bucket = F.ntile(4).over(Window.partitionBy("lang").orderBy("score", "doc_id"))
    return (
        scored.select("lang", "score", bucket.alias("bucket"))
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            # score is 6dp-rounded per doc, so round(score*1e6) is an
            # exact integer and the bucket average folds order-free
            # (r12 fold discipline); min is order-free by nature
            ieee_round(
                F.sum(F.round(F.col("score") * 1e6, 0).cast("long"))
                / F.count("*")
                / 1e6,
                4,
            ).alias("avg_score"),
            ieee_round(F.min("score"), 4).alias("min_score"),
        )
        .select("lang", F.col("bucket").cast("long").alias("bucket"),
                "n_docs", "avg_score", "min_score")
        .orderBy("lang", "bucket")
    )


_QC_NTOK = rf"CAST(len({_SQL_TOKS}) AS DOUBLE)"
_QC_GRAMS = (
    rf"list_transform(range(1, greatest(len({_SQL_TOKS}) - 1, 1) + 1), "
    rf"i -> array_to_string(({_SQL_TOKS})[i:i+1], ' '))"
)
_QC_DUP = rf"(1.0 - len(list_distinct({_QC_GRAMS})) * 1.0 / greatest(len({_QC_GRAMS}), 1))"
_QC_WLEN = (
    rf"(length(regexp_replace(lower(trim(coalesce(text, ''))), '[ \t\n\x0b\f\r]+', '', 'g')) * 1.0"
    rf" / greatest({_QC_NTOK}, 1.0))"
)
_QC_SCORE = sql_ieee_round(
    f"0.5 * least({_QC_NTOK} / 100.0, 1.0) + 0.3 * (1.0 - {_QC_DUP})"
    f" + 0.2 * least({_QC_WLEN} / 8.0, 1.0)",
    6,
)
QUALITY_CURRICULUM_SQL = f"""
WITH scored AS (
    SELECT doc_id, lang, {_QC_SCORE} AS score FROM documents
), bucketed AS (
    SELECT lang, score,
           ntile(4) OVER (PARTITION BY lang ORDER BY score, doc_id) AS bucket
    FROM scored
)
SELECT lang, CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
       {sql_ieee_round(
           'sum(CAST(round(score * 1000000) AS BIGINT)) * 1.0'
           ' / count(*) / 1000000.0', 4)} AS avg_score,
       {sql_ieee_round('min(score)', 4)} AS min_score
FROM bucketed
GROUP BY lang, bucket
ORDER BY lang, bucket
"""


# ---------------------------------------------------------------------------
# 10. Int8 embedding quantization error
# ---------------------------------------------------------------------------


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column with a
    global scale (max|x| / 127): per-label mean/max reconstruction MSE.
    The storage-shrink every 100 TB vector corpus applies before ANN
    indexing; the MSE profile is the acceptance test.

    Scale: global max|x| is a tiny agg broadcast back; the MSE is a
    pure per-row array fold (no shuffle); final agg is label-sized.
    Quantization uses floor(x/s + 0.5) on both engines — identical IEEE
    op sequence, no round-half-mode ambiguity.

    Precision parity (random-embeddings fuzz, r9): the oracle must
    CAST maxabs to DOUBLE before dividing — DuckDB's list_max over a
    FLOAT list yields FLOAT, and FLOAT / 127.0 (a DECIMAL literal)
    stays FLOAT, so without the cast the oracle quantized with a
    float32-rounded scale while Spark used float64 (greatest(double,
    float) promotes); the ~1e-7-relative scale skew moved 4dp-rounded
    ppm values on tie-heavy corpora. With the cast both engines run
    the identical double op sequence and agree bit-exactly.
    """
    emb = t(spark, sf_dir, "embeddings")
    gmax = emb.agg(
        F.max(
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
            )
        ).alias("maxabs")
    )
    scaled = emb.crossJoin(F.broadcast(gmax)).withColumn(
        "scale", F.col("maxabs") / 127.0
    )
    err = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc
        + F.pow(F.floor(x / F.col("scale") + 0.5) * F.col("scale") - x, 2),
    ) / F.size("embedding")
    return (
        scaled.select("label", err.alias("mse"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            # per-vec mse quantized to exact 1e-12 integers before the
            # group fold (r12 fold discipline): the per-vec value is a
            # fixed-order array fold (engine-identical), but the
            # per-label average was a raw double sum; max is order-free
            ieee_round(
                F.sum(F.round(F.col("mse") * 1e12, 0).cast("long"))
                / F.count("*")
                / 1e6,
                4,
            ).alias("avg_mse_ppm"),
            ieee_round(F.max("mse") * 1e6, 4).alias("max_mse_ppm"),
        )
        .select(F.col("label").cast("long").alias("label"),
                "n_vecs", "avg_mse_ppm", "max_mse_ppm")
        .orderBy("label")
    )


EMBEDDING_QUANTIZE_SQL = f"""
WITH g AS (
    SELECT max(list_max(list_transform(embedding, x -> abs(x)))) AS maxabs
    FROM embeddings
), per AS (
    SELECT label,
           list_sum(list_transform(
               embedding,
               x -> pow(floor(x / (CAST(g.maxabs AS DOUBLE) / 127.0) + 0.5) * (CAST(g.maxabs AS DOUBLE) / 127.0) - x, 2)
           )) / len(embedding) AS mse
    FROM embeddings CROSS JOIN g
)
SELECT CAST(label AS BIGINT) AS label, count(*) AS n_vecs,
       {sql_ieee_round(
           'sum(CAST(round(mse * 1e12) AS BIGINT)) * 1.0'
           ' / count(*) / 1e6', 4)} AS avg_mse_ppm,
       {sql_ieee_round('max(mse) * 1e6', 4)} AS max_mse_ppm
FROM per
GROUP BY label
ORDER BY label
"""


# ---------------------------------------------------------------------------
# 11. Robust central-tendency aggregates (mode / median)
# ---------------------------------------------------------------------------


def agg_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mode() and median() per order-priority — the robust central-tendency
    pair (exact median = sort-based; mode = per-group value counts).
    Deterministic mode via the (count desc, value) tiebreak computed
    explicitly, since engine-native mode() tiebreaks differ.

    Scale: the explicit mode is two map-side-combined aggs (value counts
    → max_by struct); exact median sorts within groups — swap to
    approx_percentile(0.5) at 100 TB (agg_approx shows that path).
    """
    orders = t(spark, sf_dir, "orders")
    # NULL statuses are not mode candidates (engine-native mode() skips
    # NULLs; keeping them would also make the c-tie break on a NULL sort
    # key — Spark NULLS FIRST vs DuckDB NULLS LAST, caught by the
    # degenerate-orders NULL-measure net)
    counts = (
        orders.filter(F.col("o_orderstatus").isNotNull())
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("c"))
    )
    rk = F.row_number().over(
        Window.partitionBy("o_orderpriority").orderBy(
            F.desc("c"), F.asc("o_orderstatus")
        )
    )
    mode_df = (
        counts.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select("o_orderpriority", F.col("o_orderstatus").alias("mode_status"))
    )
    med = orders.groupBy("o_orderpriority").agg(
        ieee_round(F.expr("median(o_totalprice)"), 2).alias("median_price"),
        F.count("*").alias("n_orders"),
    )
    return (
        med.join(F.broadcast(mode_df), "o_orderpriority")
        .select("o_orderpriority", "n_orders", "median_price", "mode_status")
        .orderBy("o_orderpriority")
    )


AGG_MODES_SQL = f"""
WITH counts AS (
    SELECT o_orderpriority, o_orderstatus, count(*) AS c
    FROM orders WHERE o_orderstatus IS NOT NULL
    GROUP BY o_orderpriority, o_orderstatus
), mode_t AS (
    SELECT o_orderpriority, o_orderstatus AS mode_status
    FROM (
        SELECT o_orderpriority, o_orderstatus,
               row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY c DESC, o_orderstatus
               ) AS rk
        FROM counts
    ) WHERE rk = 1
)
SELECT o.o_orderpriority,
       count(*) AS n_orders,
       {sql_ieee_round('median(o_totalprice)', 2)} AS median_price,
       any_value(m.mode_status) AS mode_status
FROM orders o JOIN mode_t m USING (o_orderpriority)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


# ---------------------------------------------------------------------------
# 12. Multi-resolution time rollup (continuous-aggregate shape)
# ---------------------------------------------------------------------------


def events_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour + day + month event rollups in ONE grouping-sets pass — the
    hypertable/continuous-aggregate pattern: a single scan and a single
    (expanded) shuffle produce every resolution, instead of three jobs
    re-reading the fact.

    Scale: GROUPING SETS expands each input row once per set (3×) before
    the partial aggregate — at 100 TB that trades one extra map-side
    expansion for two full re-scans, the right side of the trade whenever
    the scan dominates (it does). Output keyed by (resolution, bucket).
    """
    from .catalog import events_table

    ev = events_table(spark, sf_dir)
    bucketed = ev.select(
        F.date_trunc("hour", "ts").alias("h"),
        F.date_trunc("day", "ts").alias("d"),
        F.date_trunc("month", "ts").alias("m"),
        "value",
    )
    # exact cents fold (r12): a raw double sum is fold-order-sensitive —
    # at the 100 TB design point the accumulated double error exceeds a
    # cent outright (sum ~1e14 has ulp ~0.016), so values fold as exact
    # DECIMAL(38,0) cents. TOTALITY: the fold must keep double-sum
    # semantics for non-finite values (the r11 NaN/±inf fuzz pool):
    # any NaN or mixed ±inf → NaN, else any ±inf → that infinity, else
    # the exact-cents readout; non-finite rows are excluded from the
    # cents sum (an ANSI cast of ±inf to integer aborts). Both engines
    # compute the identical flags, so the readout stays bit-identical.
    v = F.col("value")
    inf, ninf = F.lit(float("inf")), F.lit(float("-inf"))
    finite = v.isNotNull() & ~F.isnan(v) & (v != inf) & (v != ninf)
    cents = F.when(finite, F.round(v * 100, 0).cast("decimal(38,0)"))
    rolled = (
        bucketed.groupingSets([["h"], ["d"], ["m"]], "h", "d", "m")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(cents).alias("_c"),
            F.sum(F.when(F.isnan(v), 1).otherwise(0)).alias("_nan"),
            F.sum(F.when(v == inf, 1).otherwise(0)).alias("_pinf"),
            F.sum(F.when(v == ninf, 1).otherwise(0)).alias("_ninf"),
        )
        .withColumn(
            "sum_value",
            F.when(
                (F.col("_nan") > 0)
                | ((F.col("_pinf") > 0) & (F.col("_ninf") > 0)),
                F.lit(float("nan")),
            )
            .when(F.col("_pinf") > 0, inf)
            .when(F.col("_ninf") > 0, ninf)
            .otherwise(ieee_round(F.col("_c") / 100.0, 2)),
        )
        .drop("_c", "_nan", "_pinf", "_ninf")
    )
    resolution = (
        F.when(F.col("h").isNotNull(), F.lit("hour"))
        .when(F.col("d").isNotNull(), F.lit("day"))
        .otherwise(F.lit("month"))
    )
    bucket = F.coalesce("h", "d", "m")
    return (
        rolled.select(
            resolution.alias("resolution"),
            bucket.alias("bucket"),
            "n_events",
            "sum_value",
        )
        .orderBy("resolution", "bucket")
    )


EVENTS_MULTIRES_SQL = f"""
WITH b AS (
    SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
           date_trunc('month', ts) AS m, value
    FROM events
), rolled AS (
    SELECT h, d, m, count(*) AS n_events,
           CASE WHEN count(*) FILTER (WHERE isnan(value)) > 0
                     OR (count(*) FILTER (WHERE value = 'infinity'::DOUBLE) > 0
                         AND count(*) FILTER (WHERE value = '-infinity'::DOUBLE) > 0)
                    THEN 'nan'::DOUBLE
                WHEN count(*) FILTER (WHERE value = 'infinity'::DOUBLE) > 0
                    THEN 'infinity'::DOUBLE
                WHEN count(*) FILTER (WHERE value = '-infinity'::DOUBLE) > 0
                    THEN '-infinity'::DOUBLE
                ELSE {sql_ieee_round(
                    'sum(CAST(round((CASE WHEN isfinite(value)'
                    ' THEN value END) * 100) AS BIGINT)) / 100.0', 2)}
           END AS sum_value
    FROM b
    GROUP BY GROUPING SETS ((h), (d), (m))
)
SELECT CASE WHEN h IS NOT NULL THEN 'hour'
            WHEN d IS NOT NULL THEN 'day'
            ELSE 'month' END AS resolution,
       coalesce(h, d, m) AS bucket,
       n_events, sum_value
FROM rolled
ORDER BY resolution, bucket
"""


# ---------------------------------------------------------------------------
# 13. Tokenizer vocabulary coverage curve
# ---------------------------------------------------------------------------


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative corpus coverage of the top-100 tokens by frequency —
    the curve that sizes a tokenizer vocabulary (what fraction of all
    token occurrences the first N vocab entries absorb).

    Scale: one map-side-combined token-count shuffle to a vocab-sized
    table, then rank + running sum over THAT table (vocab ≪ corpus, so
    the single-partition prefix window is over thousands of rows, not
    the corpus). Deterministic tiebreak on the token string.
    """
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(_toks().alias("toks"))
    counts = (
        tok.select(F.explode("toks").alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    total = counts.agg(F.sum("c").alias("n")).select("n")
    w = Window.orderBy(F.desc("c"), F.asc("tok"))
    ranked = counts.select(
        "tok", "c",
        F.row_number().over(w).alias("rank"),
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
    ).filter(F.col("rank") <= 100)
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            F.col("rank").cast("long").alias("rank"),
            "tok",
            F.col("c").cast("long").alias("c"),
            ieee_round(F.col("cum") / F.col("n"), 6).alias("cum_coverage"),
        )
        .orderBy("rank")
    )


VOCAB_COVERAGE_SQL = rf"""
WITH counts AS (
    SELECT tok, count(*) AS c
    FROM (SELECT unnest({_SQL_TOKS}) AS tok FROM documents)
    WHERE tok <> ''
    GROUP BY tok
), total AS (
    SELECT sum(c) AS n FROM counts
), ranked AS (
    SELECT tok, c,
           row_number() OVER (ORDER BY c DESC, tok) AS rank,
           sum(c) OVER (ORDER BY c DESC, tok
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM counts
)
SELECT CAST(rank AS BIGINT) AS rank, tok, CAST(c AS BIGINT) AS c,
       {sql_ieee_round('cum * 1.0 / n', 6)} AS cum_coverage
FROM ranked CROSS JOIN total
WHERE rank <= 100
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# 14. Cross-source duplication matrix
# ---------------------------------------------------------------------------


def source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much each source pair shares verbatim content: count of
    distinct content fingerprints present in both sources (src_a <
    src_b). The provenance diagnostic every multi-crawl corpus merge
    runs before choosing dedup priority order.

    Scale: distinct (fingerprint, source) projection (one shuffle),
    self-join on fingerprint — bounded because each fingerprint carries
    at most one row per source (≤ #sources rows per key), then a
    matrix-sized count agg. Never doc×doc.
    """
    docs = t(spark, sf_dir, "documents")
    fp = (
        docs.select(
            F.md5(F.lower(F.trim(F.coalesce(F.col("text"), F.lit(""))))).alias("fp"), "source"
        )
        .distinct()
    )
    a = fp.select("fp", F.col("source").alias("src_a"))
    b = fp.select("fp", F.col("source").alias("src_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_shared_fps"))
        .orderBy("src_a", "src_b")
    )


SOURCE_DUP_MATRIX_SQL = """
WITH fp AS (
    SELECT DISTINCT md5(lower(trim(coalesce(text, '')))) AS fp, source FROM documents
)
SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared_fps
FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
GROUP BY a.source, b.source
ORDER BY src_a, src_b
"""


# ---------------------------------------------------------------------------
# 15. Per-label embedding centroids (vector aggregate)
# ---------------------------------------------------------------------------


def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise mean embedding per label — the vector-aggregate
    primitive behind cluster summaries, IVF coarse quantizers and
    class prototypes.

    Scale: posexplode to (label, pos, val) then ONE map-side-combined
    agg on (label, pos) and a labels-sized re-assembly — row-shaped
    work the whole way, no per-group array folding, no collect. The
    centroid is re-assembled with array_agg ordered by position.
    Values rounded to 6dp for cross-engine float parity.
    """
    emb = t(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>"))
    ).toDF("label", "pos", "val")
    # fold-discipline note (r12 audit): this avg over RAW doubles is
    # deliberately exempt — the summands are float32-originated (24-bit
    # mantissa, |x|~1), so their double sum is EXACT (hence order-free)
    # while 24 + log2(group size) <= 53, i.e. up to ~5e8 vectors per
    # label; past that, switch to a quantized fold like kmeans' d
    per_dim = ex.groupBy("label", "pos").agg(
        ieee_round(F.avg("val"), 6).alias("m")
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "m"))
            ).alias("_pm")
        )
        .select(
            F.col("label").cast("long").alias("label"),
            F.transform("_pm", lambda s: s["m"]).alias("centroid"),
        )
        .withColumn("dim", F.size("centroid").cast("long"))
        .withColumn("centroid_norm", ieee_round(
            F.sqrt(
                F.aggregate(
                    F.transform("centroid", lambda x: x * x),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ),
            6,
        ))
        .select(
            "label",
            "dim",
            "centroid_norm",
            ieee_round(F.element_at("centroid", 1), 6).alias("c0"),
        )
        .orderBy("label")
    )


EMBEDDING_CENTROIDS_SQL = f"""
WITH ex AS (
    SELECT label,
           generate_subscripts(embedding, 1) - 1 AS pos,
           unnest(embedding::DOUBLE[]) AS val
    FROM embeddings
), per_dim AS (
    SELECT label, pos, {sql_ieee_round('avg(val)', 6)} AS m
    FROM ex GROUP BY label, pos
), asm AS (
    SELECT label, array_agg(m ORDER BY pos) AS centroid
    FROM per_dim GROUP BY label
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(len(centroid) AS BIGINT) AS dim,
       {sql_ieee_round('sqrt(list_reduce(list_transform(centroid, x -> x * x), (a, b) -> a + b))', 6)} AS centroid_norm,
       {sql_ieee_round('centroid[1]', 6)} AS c0
FROM asm
ORDER BY label
"""


# ---------------------------------------------------------------------------
# 16. Near-dup graph degree profile
# ---------------------------------------------------------------------------


def dup_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the Jaccard near-dup graph: how many docs
    have 1, 2, 3… near-duplicates. The shape diagnostic run before
    cluster resolution — a heavy tail means giant components and
    template families; a flat profile means pairwise dedup suffices.

    Scale: reuses dedup_jaccard_pairs' blocked plan, then two tiny aggs
    (per-node degree over pair endpoints, then a histogram over the
    degree domain). Never materializes components.
    """
    from .catalog import dedup_jaccard_pairs

    pairs = dedup_jaccard_pairs(spark, sf_dir)
    nodes = pairs.select(F.col("id_a").alias("id")).unionAll(
        pairs.select(F.col("id_b").alias("id"))
    )
    deg = nodes.groupBy("id").agg(F.count("*").alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count("*").alias("n_docs"))
        .select(F.col("degree").cast("long").alias("degree"), "n_docs")
        .orderBy("degree")
    )


def _dup_graph_degree_sql() -> str:
    # the pair set MUST be the oracle's own dedup_jaccard_pairs formulation,
    # verbatim — re-deriving it here would let the two drift
    from .catalog import DEDUP_JACCARD_SQL

    return f"""
WITH pairs AS ({DEDUP_JACCARD_SQL}),
nodes AS (
    SELECT id_a AS id FROM pairs UNION ALL SELECT id_b FROM pairs
), deg AS (
    SELECT id, count(*) AS degree FROM nodes GROUP BY id
)
SELECT CAST(degree AS BIGINT) AS degree, count(*) AS n_docs
FROM deg GROUP BY degree
ORDER BY degree
"""


DUP_GRAPH_DEGREE_SQL = _dup_graph_degree_sql()


# ---------------------------------------------------------------------------
# 17. Event inter-arrival gap profile
# ---------------------------------------------------------------------------


def events_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival gap profile (count, mean and max gap in
    seconds) — the statistic that calibrates sessionization gap
    thresholds and liveness monitors.

    Scale: one shuffle on user_id for the lag window; the per-user agg
    reuses the same partitioning (no second exchange).
    """
    from .catalog import events_table

    ev = events_table(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # gaps measured in exact integer MICROSECONDS (r12 fold discipline):
    # a raw double-seconds sum is fold-order-sensitive at the 2dp
    # readout boundary; integer micros fold order-free and both engines
    # divide the identical exact sums at readout
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    return (
        ev.select("user_id", gap_us.alias("gap_us"))
        .filter(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_gaps"),
            ieee_round(
                F.sum("gap_us") / F.count("*") / 1e6, 2
            ).alias("avg_gap_s"),
            ieee_round(F.max("gap_us") / 1e6, 2).alias("max_gap_s"),
        )
        .orderBy("user_id")
    )


EVENTS_GAP_STATS_SQL = f"""
WITH g AS (
    SELECT user_id,
           epoch_us(CAST(ts AS TIMESTAMP))
               - epoch_us(CAST(lag(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)
                 AS TIMESTAMP)) AS gap_us
    FROM events
)
SELECT user_id, count(*) AS n_gaps,
       {sql_ieee_round('sum(gap_us) * 1.0 / count(*) / 1e6', 2)}
           AS avg_gap_s,
       {sql_ieee_round('max(gap_us) / 1e6', 2)} AS max_gap_s
FROM g WHERE gap_us IS NOT NULL
GROUP BY user_id
ORDER BY user_id
"""


R5_ENTRIES: dict[str, Entry] = {
    "text_dedup_tokens": Entry(text_dedup_tokens, TEXT_DEDUP_TOKENS_SQL),
    "dup_passage_docs": Entry(dup_passage_docs, DUP_PASSAGE_SQL),
    "token_bigram_pmi": Entry(token_bigram_pmi, TOKEN_BIGRAM_PMI_SQL),
    "bm25_scores": Entry(bm25_scores, BM25_SCORES_SQL),
    "doc_length_percentiles": Entry(doc_length_percentiles, DOC_LENGTH_PCT_SQL),
    "dedup_incremental": Entry(dedup_incremental, DEDUP_INCREMENTAL_SQL),
    "sample_hash_quota": Entry(sample_hash_quota, SAMPLE_HASH_QUOTA_SQL),
    "skew_salted_agg": Entry(skew_salted_agg, SKEW_SALTED_AGG_SQL),
    "quality_curriculum": Entry(quality_curriculum, QUALITY_CURRICULUM_SQL),
    "embedding_quantize": Entry(embedding_quantize, EMBEDDING_QUANTIZE_SQL),
    "agg_modes": Entry(agg_modes, AGG_MODES_SQL),
    "events_multires_rollup": Entry(events_multires_rollup, EVENTS_MULTIRES_SQL),
    "vocab_coverage": Entry(vocab_coverage, VOCAB_COVERAGE_SQL),
    "source_dup_matrix": Entry(source_dup_matrix, SOURCE_DUP_MATRIX_SQL),
    "embedding_centroids": Entry(embedding_centroids, EMBEDDING_CENTROIDS_SQL),
    "dup_graph_degree": Entry(dup_graph_degree, DUP_GRAPH_DEGREE_SQL),
    "events_gap_stats": Entry(events_gap_stats, EVENTS_GAP_STATS_SQL),
}
