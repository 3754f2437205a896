"""Round-6f catalog entries — mining/feature-selection families:

- ``info_gain_terms``: top-K tokens by information gain for predicting
  ``lang`` (doc-level presence; the classic feature-selection ranking
  used before training text classifiers). Exact integer contingency
  counts until the final entropy logs.
- ``event_paths``: top-K most frequent 3-step event-type paths (two
  chained lags per user) — the path-mining readout funnels and
  transition matrices don't give.

Same contract as ``plans.catalog``: every entry pairs a PySpark plan
with DuckDB oracle SQL over identical parquet, identical column
aliases, floats through the shared IEEE rounding helpers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from .catalog import Entry, events_table, sql_ieee_round, t
from .catalog_r5 import _SQL_TOKS, _toks

# ---------------------------------------------------------------------------
# 1. Information-gain term ranking
# ---------------------------------------------------------------------------

_IG_TOP_K = 20


def info_gain_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K tokens by information gain w.r.t. the ``lang`` label:
    IG(t) = H(lang) − [P(t)·H(lang|t) + P(¬t)·H(lang|¬t)], with
    presence at the document level.

    Scale shape: one distinct (doc, tok, lang) pass (map-side
    combinable), a (tok, lang) count groupBy, and a per-token entropy
    fold over |langs| rows — the per-token work is label-cardinality-
    bounded, so the whole ranking is two data-sized shuffles plus a
    TakeOrdered top-K. Entropies use exact integer counts; ln appears
    only in the last expression, and ties at the K-cut break by token.
    """
    docs = t(spark, sf_dir, "documents").filter(F.col("lang").isNotNull())
    n_docs = docs.count()
    lang_tot = docs.groupBy("lang").agg(F.count("*").alias("n_l"))
    doc_toks = (
        docs.select(
            "doc_id", "lang", F.explode(_toks()).alias("tok")
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    tl = doc_toks.groupBy("tok", "lang").agg(F.count("*").alias("n_tl"))
    t_tot = tl.groupBy("tok").agg(F.sum("n_tl").alias("n_t"))
    # join the per-(tok, lang) presence counts with the lang totals to
    # get absence counts; per-token entropy terms then sum over langs
    full = (
        tl.join(F.broadcast(lang_tot), "lang")
        .join(t_tot, "tok")
        .withColumn("n_absent", F.col("n_l") - F.col("n_tl"))
    )
    # H(lang) is a scalar: compute once and cross-join (broadcast)
    h_lang = lang_tot.agg(
        (
            -F.sum(
                (F.col("n_l") / F.lit(float(n_docs)))
                * F.log(F.col("n_l") / F.lit(float(n_docs)))
            )
        ).alias("h")
    )
    plogp_present = F.when(
        F.col("n_tl") > 0,
        (F.col("n_tl") / F.col("n_t"))
        * F.log(F.col("n_tl") / F.col("n_t")),
    ).otherwise(F.lit(0.0))
    n_not_t = F.lit(float(n_docs)) - F.col("n_t")
    plogp_absent = F.when(
        (F.col("n_absent") > 0) & (n_not_t > 0),
        (F.col("n_absent") / n_not_t) * F.log(F.col("n_absent") / n_not_t),
    ).otherwise(F.lit(0.0))
    per_tok = full.groupBy("tok").agg(
        F.max("n_t").alias("n_t"),
        (-F.sum(plogp_present)).alias("h_present"),
        (-F.sum(plogp_absent)).alias("h_absent"),
    )
    cond = (
        F.col("n_t") / F.lit(float(n_docs)) * F.col("h_present")
        + (F.lit(1.0) - F.col("n_t") / F.lit(float(n_docs)))
        * F.col("h_absent")
    )
    return (
        per_tok.crossJoin(F.broadcast(h_lang))
        .select(
            "tok",
            F.col("n_t").cast("long").alias("n_docs_with"),
            ieee_round(F.col("h") - cond, 6).alias("info_gain"),
        )
        .orderBy(F.desc("info_gain"), "tok")
        .limit(_IG_TOP_K)
    )


def _info_gain_sql() -> str:
    return f"""
WITH docs AS (
    SELECT doc_id, lang, text FROM documents WHERE lang IS NOT NULL
), n AS (SELECT count(*) AS n_docs FROM docs),
   lang_tot AS (SELECT lang, count(*) AS n_l FROM docs GROUP BY lang),
   h_lang AS (
       SELECT -sum((n_l * 1.0 / n.n_docs) * ln(n_l * 1.0 / n.n_docs)) AS h
       FROM lang_tot, n
   ),
   doc_toks AS (
       SELECT DISTINCT doc_id, lang, tok
       FROM (SELECT doc_id, lang, unnest({_SQL_TOKS}) AS tok FROM docs)
       WHERE tok <> ''
   ),
   tl AS (SELECT tok, lang, count(*) AS n_tl FROM doc_toks GROUP BY tok, lang),
   t_tot AS (SELECT tok, sum(n_tl) AS n_t FROM tl GROUP BY tok),
   full_t AS (
       SELECT tl.tok, tl.n_tl, lt.n_l, tt.n_t, lt.n_l - tl.n_tl AS n_absent
       FROM tl JOIN lang_tot lt USING (lang) JOIN t_tot tt ON tt.tok = tl.tok
   ),
   per_tok AS (
       SELECT tok, max(n_t) AS n_t,
              -sum(CASE WHEN n_tl > 0
                        THEN (n_tl * 1.0 / n_t) * ln(n_tl * 1.0 / n_t)
                        ELSE 0.0 END) AS h_present,
              -sum(CASE WHEN n_absent > 0 AND (SELECT n_docs FROM n) - n_t > 0
                        THEN (n_absent * 1.0 / ((SELECT n_docs FROM n) - n_t))
                             * ln(n_absent * 1.0
                                  / ((SELECT n_docs FROM n) - n_t))
                        ELSE 0.0 END) AS h_absent
       FROM full_t GROUP BY tok
   )
SELECT tok, CAST(n_t AS BIGINT) AS n_docs_with,
       {sql_ieee_round(
           "h_lang.h - (n_t * 1.0 / n.n_docs * h_present"
           " + (1.0 - n_t * 1.0 / n.n_docs) * h_absent)", 6
       )} AS info_gain
FROM per_tok, h_lang, n
ORDER BY info_gain DESC, tok
LIMIT {_IG_TOP_K}
"""


# ---------------------------------------------------------------------------
# 2. Event path mining (3-step sequences)
# ---------------------------------------------------------------------------

_PATH_TOP_K = 10


def event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K most frequent 3-step event-type paths across users — two
    chained lags over the per-user timeline, then a count groupBy over
    the |types|³-bounded path space.

    Scale shape: the lag window partitions on user_id (the same single
    shuffle the transition matrix pays — a planner reuses it when both
    run); the path groupBy is tiny. NULL-ts events drop on both sides
    (events NULL policy; engines disagree on NULL sort placement),
    and so do keyless events — the id is the tie order (fuzz net)."""
    ev = events_table(spark, sf_dir).filter(
        F.col("ts").isNotNull() & F.col("event_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "ts", "event_id", "event_type").select(
        "event_type",
        F.lag("event_type", 2).over(w).alias("t0"),
        F.lag("event_type", 1).over(w).alias("t1"),
    )
    return (
        seq.filter(F.col("t0").isNotNull() & F.col("t1").isNotNull())
        .groupBy(
            F.col("t0").alias("step1"),
            F.col("t1").alias("step2"),
            F.col("event_type").alias("step3"),
        )
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "step1", "step2", "step3")
        .limit(_PATH_TOP_K)
    )


EVENT_PATHS_SQL = f"""
WITH seq AS (
    SELECT event_type,
           lag(event_type, 2) OVER w AS t0,
           lag(event_type, 1) OVER w AS t1
    FROM events
    WHERE ts IS NOT NULL AND event_id IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT t0 AS step1, t1 AS step2, event_type AS step3, count(*) AS n
FROM seq
WHERE t0 IS NOT NULL AND t1 IS NOT NULL
GROUP BY t0, t1, event_type
ORDER BY n DESC, step1, step2, step3
LIMIT {_PATH_TOP_K}
"""


# ---------------------------------------------------------------------------
# 3. Per-group linear regression (native regr_* aggregates)
# ---------------------------------------------------------------------------


def linreg_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language OLS fit of token count ~ n_chars using the ANSI
    ``regr_slope``/``regr_intercept``/``regr_r2`` aggregates (native in
    both engines since Spark 3.4 / DuckDB 0.8) — the one-pass streaming
    formulation, so each group is a single map-side-combinable
    aggregate, never a per-group sort or second pass.

    Scale shape: one shuffle on lang; the regression state per group is
    six running sums. Degenerate groups (a single doc, zero variance)
    yield NULL slope/r2 identically on both engines."""
    docs = t(spark, sf_dir, "documents").filter(F.col("lang").isNotNull())
    n_tok = F.size(F.filter(_toks(), lambda s: s != "")).cast("double")
    pairs = docs.select(
        "lang", F.col("n_chars").cast("double").alias("x"), n_tok.alias("y")
    )
    return (
        pairs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            ieee_round(F.expr("regr_slope(y, x)"), 6).alias("slope"),
            ieee_round(F.expr("regr_intercept(y, x)"), 6).alias("intercept"),
            ieee_round(F.expr("regr_r2(y, x)"), 6).alias("r2"),
        )
        .orderBy("lang")
    )


LINREG_BY_GROUP_SQL = f"""
WITH pairs AS (
    SELECT lang,
           CAST(n_chars AS DOUBLE) AS x,
           CAST(len(list_filter({_SQL_TOKS}, s -> s <> '')) AS DOUBLE) AS y
    FROM documents
    WHERE lang IS NOT NULL
)
SELECT lang,
       count(*) AS n_docs,
       {sql_ieee_round("regr_slope(y, x)", 6)} AS slope,
       {sql_ieee_round("regr_intercept(y, x)", 6)} AS intercept,
       {sql_ieee_round("regr_r2(y, x)", 6)} AS r2
FROM pairs
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# 4. VARIANT-typed semi-structured aggregation (Spark 4 native JSON type)
# ---------------------------------------------------------------------------


def events_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type rollup of the props payload through Spark 4's VARIANT
    type: ``try_parse_json`` once, ``try_variant_get`` typed paths after
    — the open-schema route when props keys vary by event type, vs the
    fixed-schema ``from_json`` of ``events_json_struct``.

    VARIANT parses the JSON ONCE into a binary-encoded value; each
    subsequent path access is a cheap traversal, where the
    get_json_object alternative re-parses the string per extraction —
    the difference compounds at many-paths-per-row. ``try_`` variants
    return NULL on malformed input, matching the oracle's json_valid
    guard. One map pass + one tiny groupBy."""
    ev = t(spark, sf_dir, "events")
    k = F.try_variant_get(
        F.try_parse_json(F.col("props")), "$.k", "long"
    )
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count("k").alias("n_valid_k"),
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").cast("long").alias("max_k"),
        )
        .orderBy("event_type")
    )


EVENTS_JSON_VARIANT_SQL = """
WITH x AS (
    SELECT event_type,
           CASE WHEN json_valid(props)
                THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
           END AS k
    FROM events
)
SELECT event_type,
       count(*) AS n_events,
       count(k) AS n_valid_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(max(k) AS BIGINT) AS max_k
FROM x
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# 5. First-touch / last-touch attribution
# ---------------------------------------------------------------------------

_ATTR_WINDOW_MIN = 60


def join_attribution_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch AND last-touch attribution in one pass: for every
    purchase, the earliest and latest click by the same user in the
    preceding 60 minutes, plus the click count — the two-sided as-of
    readout a single asof join can't give.

    Scale shape: the candidate join is equi on user_id with a bounded
    time predicate (user-keyed hash join; a user's event history bounds
    the pair fan-out, never the corpus), then two row_number windows
    partitioned by purchase_id — high-cardinality key, so the windows
    are executor-local after one shuffle. Ties (equal click ts) break
    by click_id on both ends. Purchases with no qualifying click drop
    on both sides (inner join). Keyless clicks/purchases are
    excluded on both engines: click_id is the tie order and
    purchase_id the output identity (random-events fuzz net)."""
    ev = events_table(spark, sf_dir).filter(
        F.col("ts").isNotNull() & F.col("event_id").isNotNull()
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    pairs = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (
            F.col("c_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {_ATTR_WINDOW_MIN} MINUTES")
        ),
    )
    w_first = Window.partitionBy("purchase_id").orderBy("c_ts", "click_id")
    w_last = Window.partitionBy("purchase_id").orderBy(
        F.desc("c_ts"), F.desc("click_id")
    )
    ranked = pairs.select(
        "purchase_id",
        "user_id",
        "click_id",
        F.row_number().over(w_first).alias("rn_a"),
        F.row_number().over(w_last).alias("rn_d"),
    )
    return (
        ranked.groupBy("purchase_id", "user_id")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("click_id")))
            .cast("long")
            .alias("first_click_id"),
            F.max(F.when(F.col("rn_d") == 1, F.col("click_id")))
            .cast("long")
            .alias("last_click_id"),
            F.count("*").alias("n_clicks"),
        )
        .orderBy("purchase_id")
    )


JOIN_ATTRIBUTION_SQL = f"""
WITH clicks AS (
    SELECT user_id AS c_user, event_id AS click_id, ts AS c_ts
    FROM events WHERE event_type = 'click' AND ts IS NOT NULL
      AND event_id IS NOT NULL
), purchases AS (
    SELECT user_id, event_id AS purchase_id, ts AS p_ts
    FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
      AND event_id IS NOT NULL
), ranked AS (
    SELECT purchase_id, user_id, click_id,
           row_number() OVER (PARTITION BY purchase_id
                              ORDER BY c_ts, click_id) AS rn_a,
           row_number() OVER (PARTITION BY purchase_id
                              ORDER BY c_ts DESC, click_id DESC) AS rn_d
    FROM purchases p JOIN clicks c
      ON p.user_id = c.c_user
     AND c.c_ts <= p.p_ts
     AND c.c_ts >= p.p_ts - INTERVAL {_ATTR_WINDOW_MIN} MINUTE
)
SELECT purchase_id, user_id,
       CAST(max(CASE WHEN rn_a = 1 THEN click_id END) AS BIGINT)
           AS first_click_id,
       CAST(max(CASE WHEN rn_d = 1 THEN click_id END) AS BIGINT)
           AS last_click_id,
       count(*) AS n_clicks
FROM ranked
GROUP BY purchase_id, user_id
ORDER BY purchase_id
"""


# ---------------------------------------------------------------------------
# 6. Entity resolution end-to-end: block → score → cluster → survive
# ---------------------------------------------------------------------------


def _er_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared ER core: fuzzy part-name pairs (the fuzzy_name_pairs
    blocking+scoring) → connected components → (id=name, component).

    Names are hashed to xxhash64 longs for the propagation (the CC
    label-sum convergence probe needs numeric labels, and 8-byte keys
    beat strings on the shuffle anyway — the same trade keys.py makes
    for fact keys); the name↔hash mapping joins back after. A 64-bit
    collision over a distinct-name domain is ~n²/2⁶⁵ — and would only
    merge two clusters, never crash."""
    from ..operators.cc_fast import components_from_edges
    from ..operators.lineage import materialize

    # Materialize the pair list ONCE (r13 eval census, scripts/
    # eval_census.py): unmaterialized, the blocked levenshtein
    # self-join re-executed 4x per entry evaluation — twice inside the
    # CC edge checkpoint (symmetric union) and twice in the name-set
    # union below — 9 part scans per run measured; 3 after. Pairs are
    # pair-count-sized (two short strings), tiny at any SF.
    pairs = materialize(fuzzy_pairs_for_er(spark, sf_dir), eager=True)
    hashed = pairs.select(
        F.xxhash64("name_a").alias("name_a"),
        F.xxhash64("name_b").alias("name_b"),
    )
    # r18: exact contraction CC (operators.cc_fast) replaces the
    # 6-round budgeted propagation — the probe-confirmed converged
    # labels are the true fixpoint, which cc_fast computes directly in
    # one pass over the pair list (and without the symmetric-union
    # edge checkpoint or the label-sum probe collects).
    comp = components_from_edges(hashed, "name_a", "name_b")
    names = (
        pairs.select(F.col("name_a").alias("name"))
        .union(pairs.select("name_b"))
        .distinct()
        .withColumn("h", F.xxhash64("name"))
    )
    return names.join(comp, names["h"] == comp["id"]).select(
        F.col("name").alias("id"), "component"
    )


def fuzzy_pairs_for_er(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    names = part.select(F.col("p_name").alias("s")).distinct().withColumn(
        "blk", F.split(F.col("s"), " ").getItem(0)
    )
    a = names.select("blk", F.col("s").alias("name_a"))
    b = names.select("blk", F.col("s").alias("name_b"))
    return (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(F.levenshtein("name_a", "name_b") <= 3)
        .select("name_a", "name_b")
    )


def er_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end: fuzzy-blocked name pairs →
    connected components → golden-record survivorship (canonical name =
    min of the cluster, member count, summed retail price across every
    part row the cluster covers).

    Iterative CC is not single-SQL-expressible, so this entry is
    rows-only at the driver; ``check_er_mass`` is its oracle-checkable
    invariant twin (node-set and price-mass conservation, computable
    from the PAIR graph alone), and tests/test_r6f_entries.py
    differential-tests the clustering against a Python union-find.

    Scale shape: pairs are block-bounded (fuzzy_name_pairs discipline),
    CC is one shuffle per round on a graph whose components are
    block-bounded cliques-ish (≤ 6 rounds), survivorship is one
    groupBy + one name-keyed join back to the part rows."""
    labels = _er_clusters(spark, sf_dir)
    part = t(spark, sf_dir, "part")
    member_rows = part.join(
        labels, part["p_name"] == labels["id"]
    ).select("component", "p_name", "p_retailprice")
    return (
        member_rows.groupBy("component")
        .agg(
            F.min("p_name").alias("golden_name"),
            F.countDistinct("p_name").alias("n_name_variants"),
            F.count("*").alias("n_part_rows"),
            # exact cents fold (r12): order-free under any partitioning
            ieee_round(
                F.sum(F.round(F.col("p_retailprice") * 100, 0).cast("long"))
                / 100.0,
                2,
            ).alias("total_price"),
        )
        .select(
            "golden_name", "n_name_variants", "n_part_rows", "total_price"
        )
        .orderBy("golden_name")
    )


def check_er_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible invariant twin of er_golden_records: clustering
    must exactly preserve the pair graph's node set and the covered
    part rows' count and price mass — all three computable from the
    PAIR graph alone, which DuckDB can build with the same blocked
    levenshtein join."""
    labels = _er_clusters(spark, sf_dir)
    part = t(spark, sf_dir, "part")
    member_rows = part.join(labels, part["p_name"] == labels["id"])
    return (
        labels.agg(F.countDistinct("id").alias("n_clustered_names"))
        .crossJoin(
            member_rows.agg(
                F.count("*").cast("long").alias("n_covered_rows"),
                # exact cents fold (r12): order-free on both engines
                ieee_round(
                    F.sum(
                        F.round(F.col("p_retailprice") * 100, 0).cast("long")
                    )
                    / 100.0,
                    2,
                ).alias("covered_price"),
            )
        )
    )


CHECK_ER_MASS_SQL = """
WITH names AS (
    SELECT DISTINCT p_name AS s FROM part
), b AS (
    SELECT s, string_split(s, ' ')[1] AS blk FROM names
), pairs AS (
    SELECT a.s AS name_a, c.s AS name_b
    FROM b a JOIN b c ON a.blk = c.blk AND a.s < c.s
    WHERE levenshtein(a.s, c.s) <= 3
), nodes AS (
    SELECT name_a AS s FROM pairs UNION SELECT name_b FROM pairs
)
SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_clustered_names,
       CAST((SELECT count(*) FROM part JOIN nodes ON p_name = s) AS BIGINT)
           AS n_covered_rows,
       (SELECT floor(sum(CAST(round(p_retailprice * 100) AS BIGINT))
                     / 100.0 * 100.0 + 0.5) / 100.0
        FROM part JOIN nodes ON p_name = s) AS covered_price
"""


R6F_ENTRIES: dict[str, Entry] = {
    "info_gain_terms": Entry(info_gain_terms, _info_gain_sql()),
    "event_paths": Entry(event_paths, EVENT_PATHS_SQL),
    "linreg_by_group": Entry(linreg_by_group, LINREG_BY_GROUP_SQL),
    "events_json_variant": Entry(events_json_variant, EVENTS_JSON_VARIANT_SQL),
    "join_attribution_window": Entry(
        join_attribution_window, JOIN_ATTRIBUTION_SQL
    ),
    "er_golden_records": Entry(er_golden_records, None),  # rows-only: CC
    "check_er_mass": Entry(check_er_mass, CHECK_ER_MASS_SQL),
}
