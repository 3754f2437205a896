"""Round-6b catalog entries — five more published-technique curation
operators, rounding out the training-data-pipeline surface:

- ``bpe_merge_pairs``: the first iteration of byte-pair-encoding merge
  mining (Sennrich et al., 2016) — corpus-weighted adjacent-symbol pair
  frequencies over the *distinct-word* table, the statistic a tokenizer
  trainer computes before every merge.
- ``decontaminate_embedding``: semantic decontamination — max cosine of
  every candidate vector against a broadcast benchmark set, the
  embedding-space complement of the n-gram ``decontaminate`` entry.
- ``semdedup_prune``: SemDeDup (Abbas et al., 2023) — within-cluster
  cosine duplicate groups pruned to the member farthest from the
  cluster centroid (pairwise-greedy, deterministic tie-break).
- ``shard_balance``: token-balanced shard assignment — contiguous
  doc-id runs packed into fixed token-budget shards, the layout step
  before distributed tokenization/training; running sum via the
  two-pass chunked helper, never a whole-corpus window.
- ``boilerplate_windows``: CCNet-style boilerplate detection (Wenzek et
  al., 2020) — W-token windows whose hash recurs in ≥ DF_MIN distinct
  documents of the SAME source are boilerplate; per-doc boilerplate
  coverage is the removal signal.

Same contract as ``plans.catalog``: every entry pairs a PySpark plan
with DuckDB oracle SQL over identical parquet, identical column
aliases, floats through the shared IEEE rounding helpers. Scale notes
sit on each entry docstring.

Reference parity note: the reference pipeline (see
``/root/reference/dataprep.py``) has no tokenizer/dedup surface — these
entries extend the engine for LLM-corpus curation per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from .catalog import Entry, sql_ieee_round, t
from .catalog_r5 import _SQL_TOKS, _toks

# ---------------------------------------------------------------------------
# 1. Distributed BPE merge-candidate mining
# ---------------------------------------------------------------------------

_BPE_TOP_K = 50


def bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K adjacent character-pair frequencies, corpus-weighted — the
    argmax of iteration 1 of BPE training is row 1 of this result.

    Scale shape (the trick that makes tokenizer training distributable):
    pair expansion runs over the DISTINCT-WORD table, not over token
    occurrences — Heaps' law makes that table sublinear in corpus size,
    so a 100 TB corpus expands millions of words, not trillions of
    tokens. Two shuffles total: the word count (map-side combined) and
    the pair sum (alphabet²-bounded groups); the top-K is a tiny global
    sort over ≤ |alphabet|² rows. Subsequent merge iterations rewrite
    the distinct-word symbol arrays in place — same shape per round.

    ANSI guard: pair starts come from a ``when(length >= 2, sequence)``
    — ``F.sequence(1, 0)`` would *descend* in Spark rather than produce
    an empty list, silently fabricating pairs for 1-char words.
    """
    docs = t(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(_toks()).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    starts = F.when(
        F.length("tok") >= 2, F.sequence(F.lit(1), F.length("tok") - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = words.select(
        "c",
        F.explode(
            F.transform(
                starts,
                lambda i: F.struct(
                    F.col("tok").substr(i, F.lit(1)).alias("left_sym"),
                    F.col("tok").substr(i + 1, F.lit(1)).alias("right_sym"),
                ),
            )
        ).alias("p"),
    )
    return (
        pairs.groupBy(
            F.col("p.left_sym").alias("left_sym"),
            F.col("p.right_sym").alias("right_sym"),
        )
        .agg(F.sum("c").cast("long").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
        .limit(_BPE_TOP_K)
    )


BPE_MERGE_PAIRS_SQL = rf"""
WITH words AS (
    SELECT tok, count(*) AS c
    FROM (SELECT unnest({_SQL_TOKS}) AS tok FROM documents)
    WHERE tok <> ''
    GROUP BY tok
), pr AS (
    SELECT substring(tok, i, 1) AS left_sym,
           substring(tok, i + 1, 1) AS right_sym, c
    FROM words, unnest(range(1, len(tok))) AS r(i)
)
SELECT left_sym, right_sym, CAST(sum(c) AS BIGINT) AS pair_count
FROM pr
GROUP BY left_sym, right_sym
ORDER BY pair_count DESC, left_sym, right_sym
LIMIT {_BPE_TOP_K}
"""


# ---------------------------------------------------------------------------
# 2. Embedding-space decontamination
# ---------------------------------------------------------------------------

_DECON_TAU = 0.30  # synthetic embeddings top out near cosine 0.47 (see
# dedup_embedding_cosine); production default would be ~0.95.


def decontaminate_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max cosine of every candidate vector against the benchmark set
    (vec_id % 37 == 0 stands in for an eval-benchmark embedding table),
    plus a hit count and a contaminated flag at τ=0.30 — the semantic
    sibling of the n-gram ``decontaminate`` entry: near-duplicate
    *meaning*, not near-duplicate *surface form*, leaks eval answers.

    Scale: in production the benchmark side is eval suites — thousands
    of rows, not billions — so stats/AQE plan the crossJoin as a
    broadcast nested-loop and the candidate scan is embarrassingly
    parallel, with per-row norm materialized once (see
    operators.dedup.norm_of PERF CONTRACT). The hint is NOT forced:
    here the stand-in benchmark (vec_id % 37) is a constant fraction of
    an SF-scaling table, and forcing a broadcast of an SF-scaling side
    is executor OOM at the design point. The
    per-candidate max is a groupBy on the candidate's own key: map-side
    partial aggregation collapses the shuffle to one row per candidate.
    NULL policy: NULL embeddings are excluded on both engines.
    """
    from ..operators.dedup import as_double, cosine, norm_of

    emb = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select(
            "vec_id",
            as_double(F.col("embedding")).alias("v"),
        )
        .withColumn("n", norm_of("v"))
    )
    bench = emb.filter(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("b_id"), F.col("v").alias("bv"), F.col("n").alias("bn")
    )
    cand = emb.filter(F.col("vec_id") % 37 != 0)
    cos6 = ieee_round(
        (
            F.aggregate(
                F.zip_with("v", "bv", lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / (F.col("n") * F.col("bn"))
        ),
        6,
    )
    scored = cand.crossJoin(bench).select(
        "vec_id", cos6.alias("cos6")
    )
    return (
        scored.groupBy("vec_id")
        .agg(
            F.max("cos6").alias("max_cos"),
            F.sum((F.col("cos6") >= _DECON_TAU).cast("long")).alias("n_hits"),
        )
        .select(
            "vec_id",
            "max_cos",
            "n_hits",
            (F.col("max_cos") >= _DECON_TAU).alias("contaminated"),
        )
        .orderBy("vec_id")
    )


# norm/cos layout identical to DEDUP_EMBEDDING_SQL in plans.catalog —
# per-row norm materialized in the CTE, one dot fold per pair.
_NORM_SQL = (
    "greatest(sqrt(list_reduce(list_transform(embedding::DOUBLE[], "
    "y -> y * y), (a, b) -> a + b)), 1e-6)"
)

DECONTAMINATE_EMBEDDING_SQL = f"""
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v, {_NORM_SQL} AS n
    FROM embeddings WHERE embedding IS NOT NULL
), bench AS (SELECT * FROM e WHERE vec_id % 37 = 0),
cand AS (SELECT * FROM e WHERE vec_id % 37 <> 0),
scored AS (
    SELECT c.vec_id,
           {sql_ieee_round(
               "list_reduce(list_transform(list_zip(c.v, b.v), "
               "p -> p[1] * p[2]), (x, y) -> x + y) / (c.n * b.n)", 6
           )} AS cos6
    FROM cand c CROSS JOIN bench b
)
SELECT vec_id, max(cos6) AS max_cos,
       CAST(sum(CASE WHEN cos6 >= {_DECON_TAU} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hits,
       max(cos6) >= {_DECON_TAU} AS contaminated
FROM scored
GROUP BY vec_id
ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# 3. SemDeDup pruning
# ---------------------------------------------------------------------------

_SEM_TAU = 0.30  # see _DECON_TAU note on the synthetic cosine range


def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: within each cluster (``label`` plays the k-means
    cluster id), vectors whose pairwise cosine ≥ τ form duplicate
    groups; keep the member FARTHEST from the cluster centroid (lowest
    centroid cosine — Abbas et al. 2023 argue it's the least redundant
    representative) and prune the rest. Pairwise-greedy form: a vector
    is pruned iff some τ-neighbor has a strictly lower centroid cosine
    (ties broken by lower vec_id) — no connected components needed,
    deterministic on both engines. The kept set is the local minima of
    the duplicate graph under that order, so every duplicate component
    keeps at least its global minimum (invariant-tested); chains can
    keep more than one member, a deliberate recall/cost trade vs the
    full transitive-closure grouping in operators.clusters.

    Scale: the cluster id bounds the quadratic — that is SemDeDup's own
    design point (clusters of ~10⁴ from k-means over 10⁸ vectors). The
    catalog twin does within-label all-pairs for DuckDB comparability;
    the production path for oversized clusters is
    operators.dedup.embedding_dup_pairs' banded hyperplane LSH with the
    hot-bucket cap. Centroids are a labels-sized table, broadcast back;
    per-dim means rounded to 6dp on both engines before the cosine so
    float summation order can't diverge. NULL embeddings and NULL
    labels (no cluster) are excluded on both engines.
    """
    from ..operators.dedup import as_double, norm_of

    emb = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull() & F.col("label").isNotNull())
        .select(
            "vec_id",
            F.col("label").cast("long").alias("label"),
            as_double(F.col("embedding")).alias("v"),
        )
        .withColumn("n", norm_of("v"))
    )
    # labels-sized centroid table: posexplode → per-(label,pos) mean
    # rounded 6dp → reassembled in pos order (same shape as the
    # embedding_centroids entry, incl. its float32-exact-sum fold
    # exemption — see the r12 fold-discipline note there).
    cent = (
        emb.select("label", F.posexplode("v"))
        .toDF("label", "pos", "val")
        .groupBy("label", "pos")
        .agg(ieee_round(F.avg("val"), 6).alias("m"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("_pm"))
        .select(
            "label",
            F.transform("_pm", lambda s: s["m"]).alias("cv"),
        )
        .withColumn("cn", norm_of("cv"))
    )
    scored = emb.join(F.broadcast(cent), "label").select(
        "label",
        "vec_id",
        "v",
        "n",
        ieee_round(
            F.aggregate(
                F.zip_with("v", "cv", lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / (F.col("n") * F.col("cn")),
            6,
        ).alias("cos_centroid"),
    )
    a = scored.select(
        F.col("label").alias("l"),
        F.col("vec_id").alias("a_id"),
        F.col("v").alias("av"),
        F.col("n").alias("an"),
        F.col("cos_centroid").alias("a_cc"),
    )
    b = scored.select(
        F.col("label").alias("l"),
        F.col("vec_id").alias("b_id"),
        F.col("v").alias("bv"),
        F.col("n").alias("bn"),
        F.col("cos_centroid").alias("b_cc"),
    )
    pair_cos6 = ieee_round(
        F.aggregate(
            F.zip_with("av", "bv", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / (F.col("an") * F.col("bn")),
        6,
    )
    pruned_ids = (
        a.join(b, "l")
        .filter(F.col("a_id") != F.col("b_id"))
        .filter(pair_cos6 >= _SEM_TAU)
        .filter(
            (F.col("b_cc") < F.col("a_cc"))
            | ((F.col("b_cc") == F.col("a_cc")) & (F.col("b_id") < F.col("a_id")))
        )
        .select(F.col("a_id").alias("vec_id"))
        .distinct()
        .withColumn("_pruned", F.lit(True))
    )
    return (
        scored.join(pruned_ids, "vec_id", "left")
        .select(
            "vec_id",
            "label",
            "cos_centroid",
            F.coalesce("_pruned", F.lit(False)).alias("pruned"),
        )
        .orderBy("vec_id")
    )


SEMDEDUP_PRUNE_SQL = f"""
WITH e AS (
    SELECT vec_id, CAST(label AS BIGINT) AS label,
           embedding::DOUBLE[] AS v, {_NORM_SQL} AS n
    FROM embeddings
    WHERE embedding IS NOT NULL AND label IS NOT NULL
), ex AS (
    SELECT label,
           generate_subscripts(v, 1) AS pos,
           unnest(v) AS val
    FROM e
), cent AS (
    SELECT label, array_agg(m ORDER BY pos) AS cv
    FROM (
        SELECT label, pos, {sql_ieee_round("avg(val)", 6)} AS m
        FROM ex GROUP BY label, pos
    )
    GROUP BY label
), cent_n AS (
    SELECT label, cv,
           greatest(sqrt(list_reduce(list_transform(cv, y -> y * y),
                                     (a, b) -> a + b)), 1e-6) AS cn
    FROM cent
), scored AS (
    SELECT e.label, e.vec_id, e.v, e.n,
           {sql_ieee_round(
               "list_reduce(list_transform(list_zip(e.v, c.cv), "
               "p -> p[1] * p[2]), (x, y) -> x + y) / (e.n * c.cn)", 6
           )} AS cos_centroid
    FROM e JOIN cent_n c USING (label)
), pruned AS (
    SELECT DISTINCT a.vec_id
    FROM scored a JOIN scored b
      ON a.label = b.label AND a.vec_id <> b.vec_id
    WHERE {sql_ieee_round(
        "list_reduce(list_transform(list_zip(a.v, b.v), "
        "p -> p[1] * p[2]), (x, y) -> x + y) / (a.n * b.n)", 6
    )} >= {_SEM_TAU}
      AND (b.cos_centroid < a.cos_centroid
           OR (b.cos_centroid = a.cos_centroid AND b.vec_id < a.vec_id))
)
SELECT s.vec_id, s.label, s.cos_centroid,
       p.vec_id IS NOT NULL AS pruned
FROM scored s LEFT JOIN pruned p ON s.vec_id = p.vec_id
ORDER BY s.vec_id
"""


# ---------------------------------------------------------------------------
# 4. Token-balanced shard assignment
# ---------------------------------------------------------------------------

_SHARD_BUDGET = 2500  # tokens per shard; ~2 shards at sf0.001, ~20 at sf0.01


def shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents (in doc_id order) into shards of ~_SHARD_BUDGET
    tokens — the layout step before tokenization/training jobs, where
    each worker should receive the same token mass, not the same doc
    count. shard_id = exclusive-running-token-sum ÷ budget, so a shard
    boundary falls wherever the budget fills; the report gives per-shard
    doc/token totals and each shard's deviation from the mean load.

    Scale: the running sum is the two-pass chunked form (the same
    pattern as operators.packing.chunked_running_offset, specialized to
    a numeric total order): doc_ids are cut into 256 contiguous ranges
    via a broadcast max, pass 1 aggregates one total per range (a
    256-row window), pass 2 runs range-LOCAL windows — NEVER a
    whole-corpus single-partition window. Everything after is a
    shards-sized aggregate plus one broadcast scalar for the mean.
    """
    # a shard layout keyed on doc_id defines NO position for a NULL id
    # (and the engines disagree on where a NULL sorts) — such rows are
    # excluded here on both sides; count them upstream with an RI-style
    # audit if they matter. Caught by the degenerate-docs net.
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull())
        .select(
            "doc_id",
            F.size(F.filter(_toks(), lambda x: x != "")).cast("long").alias("n_tok"),
        )
    )
    mx = docs.agg(F.max("doc_id").alias("_mx"))
    base = docs.crossJoin(F.broadcast(mx)).withColumn(
        "_chunk",
        F.floor(F.col("doc_id") * 256 / (F.col("_mx") + 1)).cast("int"),
    )
    chunk_tot = base.groupBy("_chunk").agg(F.sum("n_tok").alias("_ct"))
    w_off = Window.orderBy("_chunk").rowsBetween(Window.unboundedPreceding, -1)
    offs = chunk_tot.select(
        "_chunk", F.coalesce(F.sum("_ct").over(w_off), F.lit(0)).alias("_off")
    )
    w_local = (
        Window.partitionBy("_chunk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        base.withColumn("_lc", F.sum("n_tok").over(w_local) - F.col("n_tok"))
        .join(F.broadcast(offs), "_chunk")
        .withColumn("cum_before", F.col("_off") + F.col("_lc"))
    )
    shards = (
        cum.select(
            "doc_id",
            "n_tok",
            F.floor(F.col("cum_before") / _SHARD_BUDGET).cast("long").alias(
                "shard_id"
            ),
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )
    # mean load via an unpartitioned window over the SHARDS-sized frame
    # (thousands of rows at 100 TB) — a crossJoin with a scalar agg here
    # would re-evaluate the whole corpus lineage a second time.
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return shards.select(
        "shard_id",
        "n_docs",
        "total_tokens",
        "first_doc",
        "last_doc",
        # try_divide: an all-empty-docs corpus (all-NULL degenerate net)
        # gives every shard zero tokens, so the mean load is 0 and ANSI
        # `/` would throw; DuckDB's `/ 0` yields NULL — NULL on both.
        ieee_round(
            F.try_divide(
                F.col("total_tokens"), F.avg("total_tokens").over(w_all)
            ),
            4,
        ).alias("load_ratio"),
    ).orderBy("shard_id")


SHARD_BALANCE_SQL = rf"""
WITH d AS (
    SELECT doc_id,
           len(list_filter({_SQL_TOKS}, x -> x <> '')) AS n_tok
    FROM documents
    WHERE doc_id IS NOT NULL
), c AS (
    SELECT doc_id, n_tok,
           coalesce(sum(n_tok) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
    FROM d
), s AS (
    SELECT CAST(floor(cum_before / {_SHARD_BUDGET}) AS BIGINT) AS shard_id,
           count(*) AS n_docs, sum(n_tok) AS total_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM c GROUP BY 1
)
SELECT shard_id, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(total_tokens AS BIGINT) AS total_tokens,
       first_doc, last_doc,
       {sql_ieee_round(
           "total_tokens * 1.0 / (avg(total_tokens) OVER ())", 4
       )} AS load_ratio
FROM s
ORDER BY shard_id
"""


# ---------------------------------------------------------------------------
# 5. CCNet-style boilerplate windows
# ---------------------------------------------------------------------------

_BW = 5  # window length in tokens (CCNet hashes lines; the synthetic
# corpus has no line structure, so a 5-token sliding window is the unit)
_BW_DF_MIN = 3  # boilerplate = window seen in ≥ 3 distinct docs of a source


def boilerplate_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate coverage: the fraction of a doc's W-token
    windows whose hash occurs in ≥ DF_MIN distinct documents of the SAME
    source — CCNet's shard-local repeated-line filter re-expressed over
    token windows (headers, navigation chrome and licence blurbs recur
    within a crawl source, not corpus-wide; blocking on source keeps the
    distinction from corpus-global ExactSubstr profiling).

    Scale: identical never-quadratic shape to exact_substr_spans — one
    (source, hash)-keyed count-distinct shuffle whose groups are
    window-vocabulary sized (map-side combine applies), 16-byte hashes
    on the wire, then a doc-keyed count. A hot boilerplate window costs
    its own group row, never a pairwise blow-up.

    r19: n_windows is a per-row EXPRESSION summed per doc_id (the
    length of the starts range), not a count over a third explode of
    the corpus — one full tokenize+window-hash pass gone at any scale
    (noop-sink interleave 3.23 -> 2.74s; neutral under the bench's
    count() action, which prunes most of this entry either way). A
    spread_scan of the input was measured under count() and dropped:
    +0.07s of exchange against work count() never evaluates.
    """
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", "source", _toks().alias("toks"))
    starts = F.when(
        F.size("toks") >= _BW,
        F.sequence(F.lit(1), F.size("toks") - F.lit(_BW - 1)),
    ).otherwise(F.array().cast("array<int>"))
    wins = tok.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                starts,
                lambda i: F.md5(F.concat_ws(" ", F.slice("toks", i, _BW))),
            )
        ).alias("h"),
    )
    boiler = (
        wins.groupBy("source", "h")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= _BW_DF_MIN)
        .select("source", "h")
    )
    per_doc_boiler = (
        wins.join(boiler, ["source", "h"])
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_boiler"))
    )
    # per-row expression + doc-keyed SUM, not a third corpus explode:
    # a physical row's window count is the length of its starts range
    # by construction, and summing per doc_id reproduces the old
    # count-of-exploded-rows exactly under duplicate-id corpora (k
    # copies of a doc contribute k x windows-per-copy, and the ledger
    # join stays one row per id — the per-row form without the groupBy
    # fanned the readout join out k x k; caught by the alldup net)
    n_wins = tok.groupBy("doc_id").agg(
        F.sum(
            F.when(F.size("toks") >= _BW, F.size("toks") - F.lit(_BW - 1))
            .otherwise(F.lit(0))
        ).alias("n_windows")
    )
    return (
        docs.select("doc_id", "source")
        .join(n_wins, "doc_id", "left")
        .join(per_doc_boiler, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("n_boiler", F.lit(0)).cast("long").alias("n_boiler"),
            ieee_round(
                F.coalesce("n_boiler", F.lit(0))
                / F.greatest(F.coalesce("n_windows", F.lit(0)), F.lit(1)).cast(
                    "double"
                ),
                4,
            ).alias("boiler_frac"),
        )
        .orderBy("doc_id")
    )


BOILERPLATE_WINDOWS_SQL = rf"""
WITH tok AS (
    SELECT doc_id, source, {_SQL_TOKS} AS toks FROM documents
), win AS (
    SELECT doc_id, source,
           md5(array_to_string(toks[i:i+{_BW - 1}], ' ')) AS h
    FROM tok, unnest(range(1, greatest(len(toks) - {_BW - 1}, 0) + 1)) AS r(i)
), boiler AS (
    SELECT source, h FROM win
    GROUP BY source, h
    HAVING count(DISTINCT doc_id) >= {_BW_DF_MIN}
), per_doc_boiler AS (
    SELECT w.doc_id, count(*) AS n_boiler
    FROM win w JOIN boiler b ON w.source = b.source AND w.h = b.h
    GROUP BY w.doc_id
), n_wins AS (
    SELECT doc_id, count(*) AS n_windows FROM win GROUP BY doc_id
)
SELECT d.doc_id, d.source,
       CAST(coalesce(w.n_windows, 0) AS BIGINT) AS n_windows,
       CAST(coalesce(p.n_boiler, 0) AS BIGINT) AS n_boiler,
       {sql_ieee_round(
           "coalesce(p.n_boiler, 0) * 1.0 "
           "/ greatest(coalesce(w.n_windows, 0), 1)", 4
       )} AS boiler_frac
FROM documents d
LEFT JOIN n_wins w USING (doc_id)
LEFT JOIN per_doc_boiler p USING (doc_id)
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# 6. Unigram perplexity quality score (CCNet-style)
# ---------------------------------------------------------------------------


def perplexity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under the corpus's own unigram model
    (add-one smoothed) — the shape of CCNet's KenLM perplexity filter
    (Wenzek et al., 2020): documents whose token distribution is
    unlikely under the reference model (gibberish, boilerplate soup,
    wrong language) score high and get filtered or bucketed. A unigram
    model stands in for KenLM's 5-gram (no external model files in the
    engine); swapping in higher-order counts changes only the count
    key, not the plan shape.

    Scale: one vocab-sized count shuffle (map-side combined), the
    per-token -log p table broadcast onto the token stream, scoring
    map-side, one doc-keyed mean shuffle — identical skeleton to
    dsir_importance, which documents the trillion-token vocab swap.
    """
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_toks()).alias("tok")).filter(
        F.col("tok") != ""
    )
    cnt = tok.groupBy("tok").agg(F.count("*").alias("c"))
    tot = cnt.agg(F.sum("c").alias("n"), F.count("*").alias("v"))
    # per-token -log p quantized to exact 1e-9 integers in the
    # broadcast table (r12 fold discipline): the per-doc mean folds
    # order-free integers on both engines
    logp = cnt.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.round(
            -F.log((F.col("c") + 1) / (F.col("n") + F.col("v"))) * 1e9, 0
        )
        .cast("long")
        .alias("nll9"),
    )
    return (
        tok.join(F.broadcast(logp), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            ieee_round(
                F.sum("nll9") / F.count("*") / 1e9, 4
            ).alias("cross_entropy"),
        )
        .orderBy("doc_id")
    )


PERPLEXITY_SCORE_SQL = rf"""
WITH tok AS (
    SELECT doc_id, tok
    FROM (SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents)
    WHERE tok <> ''
), cnt AS (
    SELECT tok, count(*) AS c FROM tok GROUP BY tok
), tot AS (
    SELECT sum(c) AS n, count(*) AS v FROM cnt
), logp AS (
    SELECT tok,
           CAST(round(-ln((c + 1) * 1.0 / (n + v)) * 1000000000)
                AS BIGINT) AS nll9
    FROM cnt CROSS JOIN tot
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       {sql_ieee_round(
           "sum(l.nll9) * 1.0 / count(*) / 1000000000.0", 4
       )} AS cross_entropy
FROM tok t JOIN logp l USING (tok)
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


# ---------------------------------------------------------------------------
# 7. Soft dedup — downweight duplicates instead of dropping them
# ---------------------------------------------------------------------------


def dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft dedup: every copy of a duplicated document survives but
    carries sampling weight 1/multiplicity, so a training epoch sees
    each distinct text with equal expected mass — the
    downweight-don't-drop alternative (SoftDeDup) to exact_dedup's
    keep-first, preserving corpus statistics and provenance diversity.

    Scale: exactly one fingerprint count shuffle (map-side combined) —
    the md5 runs in the scan stage — then the weight is a broadcast-free
    per-row expression after the fingerprint-keyed window... expressed
    as a count re-join here: the fingerprint-count table is
    distinct-text sized; joining it back is a co-partitioned hash join
    on the same key as the count, which AQE plans shuffle-free on the
    count's partitioning.
    """
    from ..operators.dedup import normalized_fingerprint

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", normalized_fingerprint(F.col("text")).alias("fp")
    )
    mult = docs.groupBy("fp").agg(F.count("*").cast("long").alias("multiplicity"))
    return (
        docs.join(mult, "fp")
        .select(
            "doc_id",
            "multiplicity",
            ieee_round(F.lit(1.0) / F.col("multiplicity"), 6).alias("weight"),
        )
        .orderBy("doc_id")
    )


# the oracle mirrors operators.dedup.normalized_fingerprint: md5 of
# lowercased whitespace-collapsed trimmed text, NULL coalesced to ''.
_FP_SQL = (
    "md5(regexp_replace(lower(trim(coalesce(text, ''))), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))"
)

DEDUP_SOFT_WEIGHTS_SQL = f"""
WITH d AS (
    SELECT doc_id, {_FP_SQL} AS fp FROM documents
), m AS (
    SELECT fp, count(*) AS multiplicity FROM d GROUP BY fp
)
SELECT d.doc_id, CAST(m.multiplicity AS BIGINT) AS multiplicity,
       {sql_ieee_round("1.0 / m.multiplicity", 6)} AS weight
FROM d JOIN m USING (fp)
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# 8. Mergeable HLL sketches (two-level union)
# ---------------------------------------------------------------------------


def sketch_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level mergeable distinct-count sketching (Apache DataSketches
    HLL via ``hll_sketch_agg``/``hll_union_agg``): build one sketch per
    (source, shard) — the grain a 100 TB pipeline materializes per
    partition/day — then re-aggregate per source AND corpus-wide by
    UNIONING SKETCHES, never rescanning rows. Mergeability is the whole
    point: pre-aggregated sketch tables answer distinct-count questions
    at any rollup level with kilobytes of state per group.

    Sketch estimates are engine-specific, so the driver-compared output
    follows the agg_approx pattern: exact anchors plus a within-5%
    verdict column the oracle expects TRUE (DataSketches default
    lgConfigK=12 ≈ 1.6% rsd; near-exact at test cardinalities).
    """
    from ..operators.dedup import normalized_fingerprint

    docs = t(spark, sf_dir, "documents").select(
        "source",
        (F.col("doc_id") % 8).alias("shard"),
        normalized_fingerprint(F.col("text")).alias("fp"),
    )
    shard_sk = docs.groupBy("source", "shard").agg(
        F.hll_sketch_agg("fp").alias("sk"),
        F.count("*").alias("n_docs"),
    )
    per_src = shard_sk.groupBy("source").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    # coalesce: on an EMPTY corpus the global sum over zero shard rows
    # is NULL while the oracle's count(*) is 0 (empty degenerate net);
    # the sketch estimate over an empty union is already 0.0
    corpus = shard_sk.groupBy().agg(
        F.coalesce(F.sum("n_docs"), F.lit(0)).cast("long").alias("n_docs"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    ).select(F.lit("__ALL__").alias("source"), "n_docs", "est")
    exact_src = docs.groupBy("source").agg(
        F.count_distinct("fp").alias("n_distinct")
    )
    exact_all = docs.agg(F.count_distinct("fp").alias("n_distinct")).select(
        F.lit("__ALL__").alias("source"), "n_distinct"
    )
    est = per_src.unionByName(corpus)
    exact = exact_src.unionByName(exact_all).select(
        F.col("source").alias("_x_source"), "n_distinct"
    )
    # null-safe: a NULL source is a real group on both sides; plain
    # equality would drop it (the oracle never joins — single GROUP BY).
    # Caught by the degenerate-docs net.
    return (
        est.join(exact, F.col("source").eqNullSafe(F.col("_x_source")))
        .drop("_x_source")
        .select(
            "source",
            "n_docs",
            "n_distinct",
            (
                F.abs(F.col("est") - F.col("n_distinct"))
                <= 0.05 * F.col("n_distinct")
            ).alias("hll_ok"),
        )
        .orderBy("source")
    )


SKETCH_HLL_UNION_SQL = f"""
WITH d AS (
    SELECT source, {_FP_SQL} AS fp FROM documents
), per_src AS (
    SELECT source, count(*) AS n_docs, count(DISTINCT fp) AS n_distinct
    FROM d GROUP BY source
), al AS (
    SELECT '__ALL__' AS source, count(*) AS n_docs,
           count(DISTINCT fp) AS n_distinct
    FROM d
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_distinct AS BIGINT) AS n_distinct, TRUE AS hll_ok
FROM (SELECT * FROM per_src UNION ALL SELECT * FROM al)
ORDER BY source
"""


# ---------------------------------------------------------------------------
# 9. Ordered funnel analysis
# ---------------------------------------------------------------------------


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic ordered funnel: signup → first view AFTER the signup →
    first purchase AFTER that view, all within 7 days of the signup.
    Output is one row per stage with user counts and conversion vs
    stage 1.

    Scale: each stage is a user-keyed min-aggregate joined to the
    previous stage's per-user frontier — three map-side-combined
    shuffles all partitioned on user_id, so AQE reuses one exchange
    layout; no windows over raw events, no sequence materialization.
    The per-stage scalar counts ride a 3-row union.
    """
    from .catalog import events_table

    ev = events_table(spark, sf_dir)
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 7 DAYS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.first("t1").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 7 DAYS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    stages = (
        s.agg(F.count("*").alias("n_users"))
        .select(F.lit(1).alias("stage"), F.lit("signup").alias("step"), "n_users")
        .unionByName(
            v.agg(F.count("*").alias("n_users")).select(
                F.lit(2).alias("stage"), F.lit("view").alias("step"), "n_users"
            )
        )
        .unionByName(
            p.agg(F.count("*").alias("n_users")).select(
                F.lit(3).alias("stage"), F.lit("purchase").alias("step"), "n_users"
            )
        )
    )
    base = stages.filter(F.col("stage") == 1).select(
        F.greatest(F.col("n_users"), F.lit(1)).alias("_base")
    )
    return (
        stages.crossJoin(F.broadcast(base))
        .select(
            "stage",
            "step",
            F.col("n_users").cast("long").alias("n_users"),
            ieee_round(F.col("n_users") / F.col("_base"), 4).alias("conv_pct"),
        )
        .orderBy("stage")
    )


EVENTS_FUNNEL_SQL = f"""
WITH s AS (
    SELECT user_id, min(ts) AS t1 FROM events
    WHERE event_type = 'signup' GROUP BY user_id
), v AS (
    SELECT e.user_id, min(e.ts) AS t2, min(s.t1) AS t1
    FROM events e JOIN s USING (user_id)
    WHERE e.event_type = 'view'
      AND e.ts > s.t1 AND e.ts <= s.t1 + INTERVAL 7 DAY
    GROUP BY e.user_id
), p AS (
    SELECT e.user_id, min(e.ts) AS t3
    FROM events e JOIN v USING (user_id)
    WHERE e.event_type = 'purchase'
      AND e.ts > v.t2 AND e.ts <= v.t1 + INTERVAL 7 DAY
    GROUP BY e.user_id
), stages AS (
    SELECT 1 AS stage, 'signup' AS step, count(*) AS n_users FROM s
    UNION ALL
    SELECT 2, 'view', count(*) FROM v
    UNION ALL
    SELECT 3, 'purchase', count(*) FROM p
), base AS (
    SELECT greatest(n_users, 1) AS b FROM stages WHERE stage = 1
)
SELECT stage, step, CAST(n_users AS BIGINT) AS n_users,
       {sql_ieee_round("n_users * 1.0 / base.b", 4)} AS conv_pct
FROM stages CROSS JOIN base
ORDER BY stage
"""


# ---------------------------------------------------------------------------
# 10. Cohort retention
# ---------------------------------------------------------------------------


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their first
    event; for offsets 0-3 weeks, how many were active again, as a
    fraction of the cohort. The bread-and-butter product-analytics
    rollup.

    Scale: one user-keyed min shuffle for cohorts, one distinct on
    (user, week) — both map-side combined — then the retention matrix is
    cohorts×offsets sized; the cohort-size denominator is a window over
    that TINY frame, not over events.
    """
    from .catalog import events_table

    ev = events_table(spark, sf_dir)
    first = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("w")
    ).distinct()
    grid = (
        active.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.datediff("w", "cohort_week") / 7).cast("long").alias("week_offset"),
        )
        .filter(F.col("week_offset").between(0, 3))
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    w_cohort = Window.partitionBy("cohort_week")
    return (
        grid.withColumn(
            "_size",
            F.max(F.when(F.col("week_offset") == 0, F.col("n_active"))).over(
                w_cohort
            ),
        )
        .select(
            "cohort_week",
            "week_offset",
            F.col("n_active").cast("long").alias("n_active"),
            ieee_round(
                F.col("n_active") / F.greatest("_size", F.lit(1)), 4
            ).alias("retention_pct"),
        )
        .orderBy("cohort_week", "week_offset")
    )


EVENTS_RETENTION_SQL = f"""
WITH first_ev AS (
    SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
    FROM events GROUP BY user_id
), active AS (
    SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
    FROM events
), grid AS (
    SELECT f.cohort_week,
           date_diff('day', f.cohort_week, a.w) // 7 AS week_offset,
           count(DISTINCT a.user_id) AS n_active
    FROM active a JOIN first_ev f USING (user_id)
    WHERE date_diff('day', f.cohort_week, a.w) // 7 BETWEEN 0 AND 3
    GROUP BY 1, 2
)
SELECT cohort_week, week_offset,
       CAST(n_active AS BIGINT) AS n_active,
       {sql_ieee_round(
           "n_active * 1.0 / greatest(max(CASE WHEN week_offset = 0 "
           "THEN n_active END) OVER (PARTITION BY cohort_week), 1)", 4
       )} AS retention_pct
FROM grid
ORDER BY cohort_week, week_offset
"""


R6B_ENTRIES: dict[str, Entry] = {
    "bpe_merge_pairs": Entry(bpe_merge_pairs, BPE_MERGE_PAIRS_SQL),
    "decontaminate_embedding": Entry(
        decontaminate_embedding, DECONTAMINATE_EMBEDDING_SQL
    ),
    "semdedup_prune": Entry(semdedup_prune, SEMDEDUP_PRUNE_SQL),
    "shard_balance": Entry(shard_balance, SHARD_BALANCE_SQL),
    "boilerplate_windows": Entry(boilerplate_windows, BOILERPLATE_WINDOWS_SQL),
    "perplexity_score": Entry(perplexity_score, PERPLEXITY_SCORE_SQL),
    "dedup_soft_weights": Entry(dedup_soft_weights, DEDUP_SOFT_WEIGHTS_SQL),
    "sketch_hll_union": Entry(sketch_hll_union, SKETCH_HLL_UNION_SQL),
    "events_funnel": Entry(events_funnel, EVENTS_FUNNEL_SQL),
    "events_retention_cohorts": Entry(
        events_retention_cohorts, EVENTS_RETENTION_SQL
    ),
}
