"""Round-7 catalog entries — distribution comparison, drift detection,
and rank statistics (the nonparametric siblings of the r6l/r6s
inference family: welch_ttest covers means, chi_square covers
categories; these cover whole DISTRIBUTIONS and orderings):

- ``ks_two_sample``: Kolmogorov-Smirnov D between BUILDING-segment and
  other customers' spend distributions — the standard "did the
  distribution move" gate for corpus refreshes.
- ``mann_whitney_u``: rank-sum U and tie-corrected z — the
  nonparametric two-sample location test (no normality assumption,
  unlike Welch).
- ``spearman_corr``: Spearman rank correlation between per-customer
  spend and order count — monotone association where Pearson
  (agg_correlation) assumes linearity.
- ``cohens_kappa``: chance-corrected agreement between the stopword
  lang-ID heuristic and the labeled ``lang`` column — the scalar
  summary of langid_confusion's matrix (inter-annotator agreement is
  the standard readout when two labelers disagree on training data).
- ``calibration_curve``: quality-score deciles vs observed exact-dup
  rate — the reliability diagram for a heuristic curation score.
- ``pareto_skyline``: parts undominated on (retailprice, size) — the
  2-D skyline via one sorted range-window pass, not a quadratic
  dominance join.
- ``orders_acf``: autocorrelation of the daily order-count series at
  lags 1..7 — the seasonality readout events_seasonality (day-of-week
  means) doesn't give.
- ``cusum_drift``: maximum CUSUM excursion of daily revenue around its
  mean — classic change-point screen for level shifts.

Cross-engine parity strategy (the module-wide invariant): every
statistic is assembled from EXACT integer sums (cents, counts, doubled
ranks, tie cubes) with the float division as the LAST step, written
identically on both sides — so Spark and DuckDB build bit-identical
doubles regardless of aggregation order. Int64 headroom notes are on
each entry; the wide-scale upgrade path is DECIMAL(38) exactly as
orders_gini documents.

Scale shapes: the rank/CDF windows run over DISTINCT VALUES or DAYS
(value-domain- or calendar-bounded), never over the fact — the same
documented tradeoff as orders_gini's rank window, with two-phase
bucketed quantiles as the extreme-scale fallback. All 1-row
total/stat sides ride explicit broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from .catalog import Entry, sql_ieee_round, t, _text_lang_id_sql, TEXT_QUALITY_SQL

_KS_SEGMENT = "BUILDING"


def _spend_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(grp, cents): per-customer spend in exact int64 cents, grp = is
    BUILDING segment. Shared input of the three two-sample entries.
    A customer whose every order has a NULL price has NO defined spend
    (sum of all-NULL = NULL) and is excluded on BOTH engines — a NULL
    cents value would otherwise ride the rank windows, where Spark
    sorts it FIRST and DuckDB LAST (random-corpus fuzz net)."""
    per_cust = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "cents"
            )
        )
        .filter(F.col("cents").isNotNull())
    )
    seg = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        (F.col("c_mktsegment") == _KS_SEGMENT).alias("grp"),
    )
    return per_cust.join(seg, "o_custkey").select("grp", "cents")


_SPEND_BY_GROUP_SQL = f"""
    SELECT (c.c_mktsegment = '{_KS_SEGMENT}') AS grp,
           sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY o.o_custkey, c.c_mktsegment
    HAVING sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) IS NOT NULL
"""


def ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row KS readout: group sizes, D = max |F_a − F_b| over the
    pooled support, and the spend value where the max is first reached
    (ties broken toward the smallest value — identical ordering on
    both engines since the CDF doubles are built from the same exact
    integer counts).

    Shape: per-value group counts (one shuffle), then a cumulative
    window over DISTINCT spend values — value-domain-bounded, not
    fact-sized."""
    vals = (
        _spend_by_group(spark, sf_dir)
        .groupBy("cents")
        .agg(
            F.sum(F.when(F.col("grp"), 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("grp"), 0).otherwise(1)).alias("cb"),
        )
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = vals.select(
        "cents",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    tot = vals.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    d = (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "na",
            "nb",
            "cents",
            F.abs(
                F.col("cum_a") / F.col("na") - F.col("cum_b") / F.col("nb")
            ).alias("diff"),
        )
        .orderBy(F.desc("diff"), "cents")
        .limit(1)
    )
    return d.select(
        F.col("na").cast("long").alias("n_building"),
        F.col("nb").cast("long").alias("n_other"),
        ieee_round(F.col("diff"), 6).alias("ks_d"),
        ieee_round(F.col("cents") / 100.0, 2).alias("ks_at_spend"),
    )


KS_TWO_SAMPLE_SQL = f"""
WITH per_cust AS ({_SPEND_BY_GROUP_SQL}),
vals AS (
    SELECT cents,
           sum(CASE WHEN grp THEN 1 ELSE 0 END) AS ca,
           sum(CASE WHEN grp THEN 0 ELSE 1 END) AS cb
    FROM per_cust GROUP BY cents
),
cum AS (
    SELECT cents,
           sum(ca) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cum_a,
           sum(cb) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cum_b
    FROM vals
),
tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM vals),
d AS (
    SELECT na, nb, cents,
           abs(cum_a / na - cum_b / nb) AS diff
    FROM cum CROSS JOIN tot
    ORDER BY diff DESC, cents
    LIMIT 1
)
SELECT CAST(na AS BIGINT) AS n_building,
       CAST(nb AS BIGINT) AS n_other,
       {sql_ieee_round("diff", 6)} AS ks_d,
       {sql_ieee_round("cents / 100.0", 2)} AS ks_at_spend
FROM d
"""


def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row Mann-Whitney readout: U for the BUILDING group, and the
    tie-corrected normal-approximation z (no continuity correction —
    documented, identical on both sides).

    Average ranks are carried as DOUBLED ranks (2·cum_before + t + 1,
    exact int64), so the rank-sum Σ ca·dr is an exact integer and both
    engines divide once at the end. Tie correction Σ(t³−t) is likewise
    exact. Window over distinct values only."""
    vals = (
        _spend_by_group(spark, sf_dir)
        .groupBy("cents")
        .agg(
            F.sum(F.when(F.col("grp"), 1).otherwise(0)).alias("ca"),
            F.count("*").alias("tv"),
        )
    )
    wb = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = vals.select(
        "ca",
        "tv",
        (
            2 * F.coalesce(F.sum("tv").over(wb), F.lit(0))
            + F.col("tv")
            + 1
        ).alias("dr"),
    )
    agg = ranked.agg(
        F.sum("ca").alias("na"),
        F.sum(F.col("tv") - F.col("ca")).alias("nb"),
        F.sum("tv").alias("nn"),
        # Σ ca·dr is ~2n²-scale and Σ(t³−t) is n³-scale in the worst
        # (all-tied) case — the OPERAND casts to DECIMAL(38,0) so even
        # the per-row product cannot wrap, matching the oracle's
        # HUGEINT-cast operands; int64 dies at ~10⁶-10⁹ rows
        F.sum(F.col("ca").cast("decimal(38,0)") * F.col("dr")).alias(
            "dra"
        ),
        F.sum(
            F.col("tv").cast("decimal(38,0)")
            * F.col("tv")
            * F.col("tv")
            - F.col("tv")
        ).alias("ties"),
    )
    na, nb, nn = F.col("na"), F.col("nb"), F.col("nn")
    # na·(na+1) and na·nb outgrow int64 — form the exact products in
    # DECIMAL and let the double-literal divisions convert, mirroring
    # DuckDB's hugeint products converted at the division
    na_d = na.cast("decimal(38,0)")
    u = F.col("dra") / 2.0 - na_d * (na + 1) / 2.0
    var = (
        na_d
        * nb
        / 12.0
        * ((nn + 1) - F.col("ties") / (nn * (nn - 1.0)))
    )
    z = F.when(var > 0, (u - na_d * nb / 2.0) / F.sqrt(var))
    return agg.select(
        na.cast("long").alias("n_building"),
        nb.cast("long").alias("n_other"),
        ieee_round(u, 4).alias("u_stat"),
        ieee_round(z, 4).alias("z_score"),
    )


MANN_WHITNEY_U_SQL = f"""
WITH per_cust AS ({_SPEND_BY_GROUP_SQL}),
vals AS (
    SELECT cents,
           sum(CASE WHEN grp THEN 1 ELSE 0 END) AS ca,
           count(*) AS tv
    FROM per_cust GROUP BY cents
),
ranked AS (
    SELECT ca, tv,
           2 * coalesce(sum(tv) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED
                        PRECEDING AND 1 PRECEDING), 0) + tv + 1 AS dr
    FROM vals
),
agg AS (
    SELECT sum(ca) AS na, sum(tv - ca) AS nb, sum(tv) AS nn,
           sum(ca * dr) AS dra,
           -- HUGEINT operand: a BIGINT tv^3 errors past tv ~ 2e6
           sum(CAST(tv AS HUGEINT) * tv * tv - tv) AS ties
    FROM ranked
)
SELECT CAST(na AS BIGINT) AS n_building,
       CAST(nb AS BIGINT) AS n_other,
       {sql_ieee_round("dra / 2.0 - na * (na + 1) / 2.0", 4)} AS u_stat,
       {sql_ieee_round(
           "CASE WHEN na * nb / 12.0 * ((nn + 1) - ties / (nn * (nn - 1.0))) > 0 "
           "THEN (dra / 2.0 - na * (na + 1) / 2.0 - na * nb / 2.0) "
           "/ sqrt(na * nb / 12.0 * ((nn + 1) - ties / (nn * (nn - 1.0)))) END",
           4)} AS z_score
FROM agg
"""


def spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row Spearman rho between per-customer spend and order count,
    with average ranks for ties (the exact tie-aware definition, not
    the 6Σd² shortcut which is only valid tie-free).

    Both variables get doubled average ranks (exact integers) via a
    cumulative window over their own DISTINCT value tables, joined
    back; rho is Pearson on the doubled ranks (scale-invariant), all
    sums exact. The moment folds are DECIMAL(38,0) (Σdx·dy ≤ 4n³ and
    the n·Σ−Σ·Σ forms reach 4n⁴, past int64 at ~10⁶ customers) — the
    oracle's HUGEINT window sums promote identically, so both engines
    share one exactness envelope saturating near n ≈ 10⁹."""
    per_cust = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "x"
            ),
            F.count("*").alias("y"),
        )
    )

    def doubled_ranks(df: DataFrame, col: str) -> DataFrame:
        vals = df.groupBy(col).agg(F.count("*").alias("tv"))
        wb = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return vals.select(
            col,
            (
                2 * F.coalesce(F.sum("tv").over(wb), F.lit(0))
                + F.col("tv")
                + 1
            ).alias(f"dr_{col}"),
        )
    ranked = per_cust.join(
        F.broadcast(doubled_ranks(per_cust, "x")), "x"
    ).join(F.broadcast(doubled_ranks(per_cust, "y")), "y")
    # doubled ranks reach 2n+1, so the per-row squares/products are
    # 4n²-scale and the moment sums 4n³-scale — OPERAND-cast to
    # DECIMAL(38,0) (the oracle's dr is already HUGEINT: its window
    # sum promotes). The n·Σ − Σ·Σ second-moment forms reach 4n⁴: both
    # engines' 128-bit arithmetic saturates together near n ≈ 10⁹ —
    # the shared exactness envelope, up from int64's ~10⁶.
    dx = F.col("dr_x").cast("decimal(38,0)")
    dy = F.col("dr_y").cast("decimal(38,0)")
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.sum(dx).alias("sx"),  # Σdr is itself 2n²-scale
        F.sum(dy).alias("sy"),
        F.sum(dx * dx).alias("sxx"),
        F.sum(dy * dy).alias("syy"),
        F.sum(dx * dy).alias("sxy"),
    )
    n = F.col("n")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    rho = F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * 1.0) / F.sqrt(vy * 1.0))
    return agg.select(
        n.cast("long").alias("n_customers"),
        ieee_round(rho, 6).alias("spearman_rho"),
    )


SPEARMAN_CORR_SQL = f"""
WITH per_cust AS (
    SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS x,
           count(*) AS y
    FROM orders GROUP BY o_custkey
),
rx AS (
    SELECT x,
           2 * coalesce(sum(tv) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED
                        PRECEDING AND 1 PRECEDING), 0) + tv + 1 AS dr_x
    FROM (SELECT x, count(*) AS tv FROM per_cust GROUP BY x)
),
ry AS (
    SELECT y,
           2 * coalesce(sum(tv) OVER (ORDER BY y ROWS BETWEEN UNBOUNDED
                        PRECEDING AND 1 PRECEDING), 0) + tv + 1 AS dr_y
    FROM (SELECT y, count(*) AS tv FROM per_cust GROUP BY y)
),
agg AS (
    SELECT count(*) AS n,
           sum(dr_x) AS sx, sum(dr_y) AS sy,
           sum(dr_x * dr_x) AS sxx, sum(dr_y * dr_y) AS syy,
           sum(dr_x * dr_y) AS sxy
    FROM per_cust p JOIN rx ON p.x = rx.x JOIN ry ON p.y = ry.y
)
SELECT CAST(n AS BIGINT) AS n_customers,
       {sql_ieee_round(
           "CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN "
           "(n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * 1.0) "
           "/ sqrt((n * syy - sy * sy) * 1.0) END", 6)} AS spearman_rho
FROM agg
"""


def cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row Cohen's kappa: observed agreement p_o, chance agreement
    p_e from the marginals, and kappa = (p_o − p_e)/(1 − p_e), between
    the stopword lang-ID heuristic and the labeled lang column
    (NULL → 'und', exactly langid_confusion's folding).

    All three come from exact integer counts: p_o = N·diag, p_e =
    Σ row_k·col_k over N² — assembled as integers, divided once.
    Kappa is NULL when p_e = 1 (degenerate single-class case)."""
    from ..operators.text import lang_id

    docs = t(spark, sf_dir, "documents")
    conf = (
        docs.select(
            F.coalesce(F.col("lang"), F.lit("und")).alias("a"),
            lang_id("text").alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count("*").alias("n"))
    )
    conf = conf.localCheckpoint()  # 3 consumers of a |langs|²-row table
    rows = conf.groupBy("a").agg(F.sum("n").alias("ra"))
    cols = conf.groupBy("b").agg(F.sum("n").alias("cb"))
    marg = (
        rows.join(cols, rows["a"] == cols["b"], "full_outer")
        .select(
            (
                F.coalesce(F.col("ra"), F.lit(0))
                * F.coalesce(F.col("cb"), F.lit(0))
            ).alias("rc")
        )
        .agg(F.sum("rc").alias("chance"))
    )
    diag = conf.filter(F.col("a") == F.col("b")).agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("hits")
    )
    tot = conf.agg(F.sum("n").alias("nn"))
    j = tot.crossJoin(F.broadcast(diag)).crossJoin(F.broadcast(marg))
    nn = F.col("nn")
    po = F.col("hits") / nn
    pe = F.col("chance") / (nn * nn)
    kappa = F.when(pe < 1, (po - pe) / (1 - pe))
    return j.select(
        nn.cast("long").alias("n_docs"),
        ieee_round(po, 6).alias("p_observed"),
        ieee_round(pe, 6).alias("p_expected"),
        ieee_round(kappa, 6).alias("kappa"),
    )


COHENS_KAPPA_SQL = f"""
WITH pred AS ({_text_lang_id_sql("lang")}),
conf AS (
    -- lang rides the pred CTE: a doc_id re-join would drop NULL-id
    -- docs that the Spark per-row form counts (degenerate-docs net)
    SELECT coalesce(lang, 'und') AS a, lang_guess AS b, count(*) AS n
    FROM pred
    GROUP BY 1, 2
),
marg AS (
    SELECT sum(coalesce(ra, 0) * coalesce(cb, 0)) AS chance
    FROM (SELECT a, sum(n) AS ra FROM conf GROUP BY a) r
    FULL OUTER JOIN (SELECT b, sum(n) AS cb FROM conf GROUP BY b) c
      ON r.a = c.b
),
diag AS (SELECT coalesce(sum(n), 0) AS hits FROM conf WHERE a = b),
tot AS (SELECT sum(n) AS nn FROM conf)
SELECT CAST(nn AS BIGINT) AS n_docs,
       {sql_ieee_round("hits / nn", 6)} AS p_observed,
       {sql_ieee_round("chance / (nn * nn)", 6)} AS p_expected,
       {sql_ieee_round(
           "CASE WHEN chance / (nn * nn) < 1 THEN "
           "(hits / nn - chance / (nn * nn)) / (1 - chance / (nn * nn)) END",
           6)} AS kappa
FROM tot CROSS JOIN diag CROSS JOIN marg
"""


def calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the heuristic quality score: documents in
    quality DECILES (ntile over (quality, doc_id) — fully deterministic
    total order) vs the observed exact-duplicate rate per decile.

    mean_quality sums the 4dp scores as exact integer ten-thousandths;
    dup_rate is an integer ratio — both divisions happen once. The
    ntile window is presentation-sized (|docs| at driver SF; two-phase
    bucketed quantiles are the extreme-scale fallback, as rfm_segments
    documents)."""
    from ..operators.text import quality_score

    docs = t(spark, sf_dir, "documents")
    norm = F.regexp_replace(
        F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))), "\\s+", " "
    )
    scored = docs.select(
        "doc_id",
        quality_score("text").alias("quality"),
        F.md5(norm).alias("fp"),
    )
    wf = Window.partitionBy("fp")
    flagged = scored.select(
        "doc_id",
        "quality",
        "fp",
        (F.count("*").over(wf) > 1).cast("int").alias("is_dup"),
    )
    # NULLS LAST + fp tiebreak: a NULL doc_id must land in the SAME
    # decile on both engines (Spark defaults NULLS FIRST, DuckDB NULLS
    # LAST), and the content fingerprint totalizes the order if two
    # NULL-id docs tie on quality. No-op on clean data (doc_id is a
    # unique non-null key there). Caught by the degenerate-docs net.
    wd = Window.orderBy("quality", F.asc_nulls_last("doc_id"), "fp")
    return (
        flagged.select(
            F.ntile(10).over(wd).alias("decile"), "quality", "is_dup"
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.round(F.col("quality") * 10000, 0).cast("long")).alias(
                "q4"
            ),
            F.sum("is_dup").alias("dups"),
        )
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.col("n_docs").cast("long").alias("n_docs"),
            ieee_round(F.col("q4") / 10000.0 / F.col("n_docs"), 6).alias(
                "mean_quality"
            ),
            ieee_round(F.col("dups") / F.col("n_docs"), 6).alias("dup_rate"),
        )
        .orderBy("decile")
    )


CALIBRATION_CURVE_SQL = f"""
-- quality + fingerprint from ONE scan: the old q JOIN fp ON doc_id
-- silently dropped NULL-id docs the Spark per-row form keeps
-- (degenerate-docs net); decile order pins doc_id NULLS LAST + the fp
-- tiebreak, mirroring the Spark window
WITH base AS (
    SELECT doc_id,
           CAST(len(string_split_regex(lower(trim(coalesce(text, ''))), '[ \\t\\n\\x0b\\f\\r]+')) AS DOUBLE) AS n_tok,
           CAST(len(list_distinct(string_split_regex(lower(trim(coalesce(text, ''))), '[ \\t\\n\\x0b\\f\\r]+'))) AS DOUBLE) AS n_uniq,
           CAST(length(coalesce(text, '')) AS DOUBLE) AS n_chars,
           CAST(length(regexp_replace(coalesce(text, ''), '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha,
           md5(regexp_replace(lower(trim(coalesce(text, ''))), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')) AS fp
    FROM documents
),
flagged AS (
    SELECT doc_id,
           {sql_ieee_round(
               "0.4 * least(n_tok / 200.0, 1.0) "
               "+ 0.3 * (CASE WHEN n_chars > 0 THEN n_alpha / n_chars ELSE 0.0 END) "
               "+ 0.3 * (CASE WHEN n_tok > 0 THEN n_uniq / n_tok ELSE 0.0 END)",
               4,
           )} AS quality,
           fp,
           CAST(count(*) OVER (PARTITION BY fp) > 1 AS INTEGER) AS is_dup
    FROM base
),
deciled AS (
    SELECT ntile(10) OVER (ORDER BY quality, doc_id NULLS LAST, fp) AS decile,
           quality, is_dup
    FROM flagged
),
agg AS (
    SELECT decile, count(*) AS n_docs,
           sum(CAST(round(quality * 10000) AS BIGINT)) AS q4,
           sum(is_dup) AS dups
    FROM deciled GROUP BY decile
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(n_docs AS BIGINT) AS n_docs,
       {sql_ieee_round("q4 / 10000.0 / n_docs", 6)} AS mean_quality,
       {sql_ieee_round("dups * 1.0 / n_docs", 6)} AS dup_rate
FROM agg
ORDER BY decile
"""


def pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts undominated on (p_retailprice min, p_size min) — the 2-D
    skyline: no other part is ≤ on both axes and < on at least one.

    One sorted pass instead of the quadratic NOT-EXISTS join: with an
    integer-cents RANGE window ordered by price, a part survives iff
    (a) no strictly-cheaper part has size ≤ its size and (b) no
    same-or-cheaper part has size strictly < its size. Duplicated
    (price, size) minima all survive (neither strictly dominates).
    The window is over the PART dimension; at extreme scale the
    price axis pre-buckets into per-range partial minima first."""
    # Skyline is defined only over parts with BOTH axes present: a NULL
    # price must not dominate anything — and engines disagree on where a
    # NULL sort key lands in a RANGE frame (Spark NULLS FIRST would put
    # a NULL-price part's size into EVERY prefix frame; DuckDB NULLS
    # LAST would not). Caught by a degenerate-part probe.
    parts = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_retailprice").isNotNull() & F.col("p_size").isNotNull())
        .select(
            "p_partkey",
            "p_retailprice",
            "p_size",
            F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("pc"),
        )
    )
    w_lt = Window.orderBy("pc").rangeBetween(Window.unboundedPreceding, -1)
    w_le = Window.orderBy("pc").rangeBetween(Window.unboundedPreceding, 0)
    flagged = parts.select(
        "p_partkey",
        "p_retailprice",
        "p_size",
        F.min("p_size").over(w_lt).alias("m_lt"),
        F.min("p_size").over(w_le).alias("m_le"),
    )
    return (
        flagged.filter(
            (F.col("m_lt").isNull() | (F.col("m_lt") > F.col("p_size")))
            & (F.col("m_le") >= F.col("p_size"))
        )
        .select(
            F.col("p_partkey").cast("long").alias("p_partkey"),
            ieee_round(F.col("p_retailprice"), 2).alias("price"),
            F.col("p_size").cast("long").alias("size"),
        )
        .orderBy("price", "size", "p_partkey")
    )


PARETO_SKYLINE_SQL = f"""
WITH parts AS (
    SELECT p_partkey, p_retailprice, p_size,
           CAST(round(p_retailprice * 100) AS BIGINT) AS pc
    FROM part
    WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
),
flagged AS (
    SELECT p_partkey, p_retailprice, p_size,
           min(p_size) OVER (ORDER BY pc RANGE BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS m_lt,
           min(p_size) OVER (ORDER BY pc RANGE BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS m_le
    FROM parts
)
SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
       {sql_ieee_round("p_retailprice", 2)} AS price,
       CAST(p_size AS BIGINT) AS size
FROM flagged
WHERE (m_lt IS NULL OR m_lt > p_size) AND m_le >= p_size
ORDER BY price, size, p_partkey
"""


_ACF_MAX_LAG = 7


def orders_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the daily order-count series at lags
    1..7: r_ℓ = Σ(x_t−μ)(x_{t+ℓ}−μ) / Σ(x−μ)², the numerator over
    matched day pairs (t, t+ℓ), μ and denominator over the full series.

    Assembled scale-free: numerator·n² and denominator·n are exact
    integers (counts are ints, μ = s/n rational), so the single double
    division r = n·num_int / (np-independent den_int) is identical on
    both engines. The daily table is calendar-bounded (~2.4k rows at
    any SF); pair matching is a self-join on date+ℓ — no window over
    the fact."""
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count("*").alias("x"))
    )
    daily = daily.localCheckpoint()  # feeds stats + both join sides
    # daily counts x reach rows/2400 days (~6e8 at 100 TB): x² and the
    # n²·Σ / Σ·Σ moment forms outgrow int64 → DECIMAL(38,0) operands,
    # matching the oracle's HUGEINT window/aggregate promotions
    stats = daily.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("s2"),
    )
    lagged = daily.select(
        "d",
        "x",
        F.explode(
            F.sequence(F.lit(1), F.lit(_ACF_MAX_LAG))
        ).alias("lag"),
    ).select("lag", F.date_add("d", F.col("lag")).alias("d2"), F.col("x").alias("xt"))
    pairs = lagged.join(
        daily.select(F.col("d").alias("d2"), F.col("x").alias("xl")), "d2"
    )
    per_lag = pairs.groupBy("lag").agg(
        F.count("*").alias("np"),
        F.sum(F.col("xt").cast("decimal(38,0)") * F.col("xl")).alias("sxy"),
        F.sum("xt").alias("sxt"),
        F.sum("xl").alias("sxl"),
    )
    n = F.col("n")
    s_d = F.col("s").cast("decimal(38,0)")
    num = n * n * F.col("sxy") - n * s_d * (
        F.col("sxt") + F.col("sxl")
    ) + F.col("np") * s_d * s_d
    den = n * (n * F.col("s2") - s_d * s_d)
    return (
        per_lag.crossJoin(F.broadcast(stats))
        .select(
            F.col("lag").cast("long").alias("lag"),
            F.col("np").cast("long").alias("n_pairs"),
            # double casts mirror the oracle's hugeint→double division
            ieee_round(
                F.when(
                    den > 0, num.cast("double") / den.cast("double")
                ),
                6,
            ).alias("acf"),
        )
        .orderBy("lag")
    )


ORDERS_ACF_SQL = f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS x
    FROM orders GROUP BY 1
),
stats AS (
    SELECT count(*) AS n, sum(x) AS s, sum(x * x) AS s2 FROM daily
),
per_lag AS (
    SELECT g.lag, count(*) AS np,
           sum(d1.x * d2.x) AS sxy,
           sum(d1.x) AS sxt, sum(d2.x) AS sxl
    FROM daily d1
    CROSS JOIN (SELECT unnest(generate_series(1, {_ACF_MAX_LAG})) AS lag) g
    JOIN daily d2 ON d2.d = d1.d + CAST(g.lag AS INTEGER)
    GROUP BY g.lag
)
SELECT CAST(lag AS BIGINT) AS lag,
       CAST(np AS BIGINT) AS n_pairs,
       {sql_ieee_round(
           "CASE WHEN n * (n * s2 - s * s) > 0 THEN "
           "(n * n * sxy - n * s * (sxt + sxl) + np * s * s) * 1.0 "
           "/ (n * (n * s2 - s * s)) END", 6)} AS acf
FROM per_lag CROSS JOIN stats
ORDER BY lag
"""


def cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row CUSUM change-point screen on daily revenue: the maximum
    |cumulative deviation from the series mean|, the first date where
    it peaks, and its sign (+1 = revenue ran above the mean into the
    peak).

    Exactness: S_t·n = n·cumsum_t − t·total is an exact int64 (cents),
    so the peak location and ordering are integer comparisons; the one
    double division converts to dollars at the end. Int64 headroom:
    n_days (~2.4k, calendar-bounded) × total cents — fine through ~10⁵×
    this SF, DECIMAL(38) beyond. The cumulative window runs over DAYS."""
    daily = (
        t(spark, sf_dir, "orders")
        # a dateless order has no position in a time series: the cumsum
        # window and the peak tiebreak both order by d, where a NULL
        # sorts FIRST on Spark and LAST on DuckDB (degenerate-orders
        # NULL-measure net)
        .filter(F.col("o_orderdate").isNotNull())
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "cents"
            )
        )
    )
    stats = daily.agg(
        F.count("*").alias("n"), F.sum("cents").alias("tot")
    )
    w = Window.orderBy("d")
    cum = daily.select(
        "d",
        F.sum("cents").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum"),
        F.row_number().over(w).alias("i"),
    )
    exc = (
        cum.crossJoin(F.broadcast(stats))
        .select(
            "n",
            "d",
            # n·cum reaches days × global cents ≈ 2.4e3 · 1.5e18 at
            # 100 TB — past int64; DECIMAL(38,0) operands match the
            # oracle's HUGEINT products
            (
                F.col("n").cast("decimal(38,0)") * F.col("cum")
                - F.col("i").cast("decimal(38,0)") * F.col("tot")
            ).alias("sn"),
        )
        .orderBy(F.abs(F.col("sn")).desc(), "d")
        .limit(1)
    )
    return exc.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("d").alias("peak_date"),
        # cast mirrors the oracle's abs(sn)·1.0 hugeint→double step
        ieee_round(
            F.abs(F.col("sn")).cast("double") / F.col("n") / 100.0, 2
        ).alias("max_excursion"),
        F.signum(F.col("sn")).cast("long").alias("direction"),
    )


CUSUM_DRIFT_SQL = f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
),
stats AS (SELECT count(*) AS n, sum(cents) AS tot FROM daily),
cum AS (
    SELECT d,
           sum(cents) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
           row_number() OVER (ORDER BY d) AS i
    FROM daily
),
exc AS (
    SELECT n, d, n * cum - i * tot AS sn
    FROM cum CROSS JOIN stats
    ORDER BY abs(n * cum - i * tot) DESC, d
    LIMIT 1
)
SELECT CAST(n AS BIGINT) AS n_days,
       d AS peak_date,
       {sql_ieee_round("abs(sn) * 1.0 / n / 100.0", 2)} AS max_excursion,
       CAST(sign(sn) AS BIGINT) AS direction
FROM exc
"""


R7_ENTRIES: dict[str, Entry] = {
    "ks_two_sample": Entry(ks_two_sample, KS_TWO_SAMPLE_SQL),
    "mann_whitney_u": Entry(mann_whitney_u, MANN_WHITNEY_U_SQL),
    "spearman_corr": Entry(spearman_corr, SPEARMAN_CORR_SQL),
    "cohens_kappa": Entry(cohens_kappa, COHENS_KAPPA_SQL),
    "calibration_curve": Entry(calibration_curve, CALIBRATION_CURVE_SQL),
    "pareto_skyline": Entry(pareto_skyline, PARETO_SKYLINE_SQL),
    "orders_acf": Entry(orders_acf, ORDERS_ACF_SQL),
    "cusum_drift": Entry(cusum_drift, CUSUM_DRIFT_SQL),
}
