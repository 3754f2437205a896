"""Round-6d catalog entries — sampling, skew-mitigation, and statistical
analytics families:

- ``sample_weighted``: weighted sampling without replacement via the
  Efraimidis–Spirakis exponential-key method (keys fully deterministic
  from md5 hashing, so both engines draw the identical sample).
- ``skew_salted_join``: the differential salt-and-replicate rewrite for
  skewed-key JOINs (hot keys salted + dim-replicated, cold keys plain,
  union) — proven row-identical to the plain join by its oracle, which
  IS the plain join.
- ``agg_correlation``: Pearson correlation + sample covariance between
  the daily click and purchase series.
- ``chi_square_independence``: χ² statistic for source × lang
  independence on the contingency table — the categorical drift test.

Same contract as ``plans.catalog``: every entry pairs a PySpark plan
with DuckDB oracle SQL over identical parquet, identical column
aliases, floats through the shared IEEE rounding helpers.

Reference parity note: the reference pipeline
(``/root/reference/dataprep.py``) has no sampling/statistics surface —
these extend the engine per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from .catalog import Entry, events_table, sql_ieee_round, t

# ---------------------------------------------------------------------------
# 1. Weighted sampling without replacement (Efraimidis–Spirakis)
# ---------------------------------------------------------------------------

_WS_K = 50
_TWO60 = float(1 << 60)


def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample of K docs without replacement, P(doc) ∝ n_chars —
    Efraimidis & Spirakis (2006): key_i = ln(u_i)/w_i with u_i uniform,
    keep the K largest keys.

    Scale shape: the key is computed map-side from a content hash (no
    rng state, no driver round-trip); selection is a global top-K, which
    Spark executes as per-partition TakeOrdered + a K-row driver merge —
    no full sort, no shuffle of the data. The sample is a pure function
    of the corpus, so reruns, retries, and cluster sizes all draw the
    same rows (the property rand()-based sampling loses).

    Determinism across engines: u = (first 60 md5 bits + 1) / 2^60 is
    in (0, 1] and bit-identical on both sides; ln/divide are single-ulp
    IEEE ops, and the probability that two of ~n² key pairs land within
    ulp distance of each other (the only way the K-cut could disagree)
    is ≈ 0. Degenerate weights clamp to ≥ 1 so zero-length docs stay
    sample-able rather than dividing by zero."""
    docs = t(spark, sf_dir, "documents")
    # explicit NULL-id sentinel: concat_ws SKIPS a NULL arg ('ws') while
    # the oracle's concat treats it as empty ('ws:') — two engines would
    # hash different strings for the same row. Both now hash 'ws:~null~'.
    # No-op on clean data (doc_id non-null -> same 'ws:<id>' as before).
    # Caught by the degenerate-docs net.
    id_str = F.coalesce(F.col("doc_id").cast("string"), F.lit("~null~"))
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit("ws"), id_str)), 1, 15
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(_TWO60)
    w = F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    key = F.log(u) / w
    return (
        docs.select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            key.alias("_key"),
        )
        .orderBy(F.desc("_key"), F.asc_nulls_last("doc_id"))
        .limit(_WS_K)
        .select(
            "doc_id",
            "source",
            "n_chars",
            ieee_round(F.col("_key"), 6).alias("es_key"),
        )
        .orderBy("doc_id")
    )


SAMPLE_WEIGHTED_SQL = f"""
WITH keyed AS (
    SELECT doc_id, source, n_chars,
           ln((CAST(concat('0x', substring(
                   md5(concat('ws', ':',
                       coalesce(CAST(doc_id AS VARCHAR), '~null~'))), 1, 15))
               AS BIGINT) + 1.0) / {_TWO60})
             / greatest(n_chars, 1) AS k
    FROM documents
), top AS (
    SELECT * FROM keyed ORDER BY k DESC, doc_id NULLS LAST LIMIT {_WS_K}
)
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
       {sql_ieee_round("k", 6)} AS es_key
FROM top
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# 2. Salt-and-replicate skewed-key JOIN
# ---------------------------------------------------------------------------

_SALT_N = 8


_HOT_TOP_K = 100  # the known-hot key list: top keys by fact-row count


def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority through a DIFFERENTIALLY SALTED
    lineitem⋈orders join: the ``_HOT_TOP_K`` keys with the most fact
    rows get their join key extended with a deterministic salt (dim
    rows for those keys replicated across all ``_SALT_N`` salt values);
    the cold majority takes the plain join; the two halves union before
    the aggregate. The hot list is deterministic (count desc, key
    tie-break) and bounded, so its broadcast can never blow up.

    The oracle is the PLAIN join — passing the hash gate proves the
    rewrite is result-identical to the join it replaces (the agg-side
    twin is ``skew_salted_agg``; this is the join-side technique, which
    AQE's skew-join split automates only for sort-merge shapes it can
    see).

    Scale shape: differential (hot-keys-only) salting is the production
    form — blanket dim replication multiplies the whole build side by
    _SALT_N (measured 5× on this query at sf0.1), while replicating
    only the hot-key dim rows costs _SALT_N × |hot keys|, which is tiny
    by definition of skew. The hot-key list is a count-aggregate on the
    fact (map-side combined) and broadcasts into both sides' salt
    columns. The salt is md5-derived (content-addressed), not rand():
    retried tasks re-salt rows identically, so retries can't
    double-count.

    r19 single-join form (same differential technique, fewer passes):
    instead of splitting fact and dim into hot/cold branches and
    unioning two joins — which scanned the fact THREE times (hot list,
    hot branch, cold branch) and the dim twice — the hot-list broadcast
    now drives a salt COLUMN on each side: fact rows of hot keys salt
    md5%N, cold rows salt 0; dim rows of hot keys explode across all N
    salts, cold rows keep the single salt-0 copy. ONE equi-join on
    (key, salt) then produces exactly the old union's row multiset (a
    hot pair matches at precisely its fact salt replica; a cold pair
    at salt 0), with hot keys spread over N shuffle partitions as
    before. 7 scans → 2 in the plan; the oracle stays the PLAIN join."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    hot = (
        li.groupBy("l_orderkey")
        .agg(F.count("*").alias("_n"))
        .orderBy(F.desc("_n"), "l_orderkey")
        .limit(_HOT_TOP_K)
        .select(F.col("l_orderkey").alias("_hot_key"))
    )
    salt_f = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col("l_orderkey"), F.col("l_linenumber")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % _SALT_N
    )
    fact_salted = (
        li.join(
            F.broadcast(hot), li["l_orderkey"] == hot["_hot_key"], "left"
        )
        .withColumn(
            "_salt",
            F.when(F.col("_hot_key").isNotNull(), salt_f).otherwise(
                F.lit(0).cast("long")
            ),
        )
        .drop("_hot_key")
    )
    dim_salted = (
        orders.join(
            F.broadcast(hot),
            orders["o_orderkey"] == hot["_hot_key"],
            "left",
        )
        .withColumn(
            "_salt",
            F.explode(
                F.when(
                    F.col("_hot_key").isNotNull(),
                    F.sequence(
                        F.lit(0), F.lit(_SALT_N - 1)
                    ).cast("array<long>"),
                ).otherwise(F.array(F.lit(0).cast("long")))
            ),
        )
        .drop("_hot_key")
    )
    joined = fact_salted.join(
        dim_salted,
        (fact_salted["l_orderkey"] == dim_salted["o_orderkey"])
        & (fact_salted["_salt"] == dim_salted["_salt"]),
    ).select("o_orderpriority", "l_extendedprice", "l_discount")
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            # exact revenue-unit fold (q1 idiom, r12 fold discipline):
            # raw double revenue sums are fold-order-sensitive at the
            # 2dp readout boundary; DECIMAL(38,0) units fold exactly
            ieee_round(
                F.sum(
                    (
                        F.round(F.col("l_extendedprice") * 100, 0).cast(
                            "long"
                        )
                        * (
                            F.lit(100)
                            - F.round(F.col("l_discount") * 100, 0).cast(
                                "long"
                            )
                        )
                    ).cast("decimal(38,0)")
                )
                / 10000.0,
                2,
            ).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


SKEW_SALTED_JOIN_SQL = f"""
SELECT o_orderpriority,
       count(*) AS n_items,
       {sql_ieee_round(
           "sum(CAST(round(l_extendedprice * 100) AS BIGINT)"
           " * (100 - CAST(round(l_discount * 100) AS BIGINT)))"
           " / 10000.0", 2)}
           AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# 3. Correlation between daily event series
# ---------------------------------------------------------------------------


def agg_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation and sample covariance between the daily click
    count and daily purchase count series.

    Scale shape: conditional-sum pivot to one row per day (single
    map-combined shuffle), then the corr/covar readout over the tiny
    day series. Both statistics are computed from EXACT integer sums
    (n, Σx, Σy, Σxy, Σx², Σy² as DECIMAL(38,0) — daily counts square
    past int64 at the 100 TB design point) with the textbook closed
    forms, NOT the engines' native corr/covar aggregates: (a) exact
    integer folds are order-free (r12 fold discipline), (b) both
    engines then execute the identical double ops on identical
    integers — no streaming-formulation ulp to absorb — and (c)
    Spark 4's ANSI ``corr`` RAISES DIVIDE_BY_ZERO on a zero-variance
    series (caught by the r12 mixnull full-catalog sweep: duplicated
    keys + NULL measures collapse the day series to a constant) where
    DuckDB returns NULL; the explicit guards give NULL on both."""
    ev = events_table(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    sums = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x") * F.col("y"))).alias("sxy"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
        F.sum(dec(F.col("y") * F.col("y"))).alias("syy"),
    )
    n = F.col("n").cast("double")
    cov_num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return sums.select(
        F.col("n").alias("n_days"),
        ieee_round(
            F.when(
                (F.col("n") >= 2) & (vx > 0) & (vy > 0),
                cov_num / F.sqrt(vx * vy),
            ),
            6,
        ).alias("corr_cp"),
        ieee_round(
            F.when(F.col("n") >= 2, cov_num / n / (n - 1)), 6
        ).alias("covar_cp"),
    )


AGG_CORRELATION_SQL = f"""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS d,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS x,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS y
    FROM events GROUP BY 1
), s AS (
    -- products widened to HUGEINT to mirror the Spark side's
    -- DECIMAL(38,0) sums (advisor r12: plain BIGINT x*y contradicted
    -- the stated exact-integer contract; daily counts square past
    -- int64 at the design point)
    SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
           sum(CAST(x AS HUGEINT) * y) AS sxy,
           sum(CAST(x AS HUGEINT) * x) AS sxx,
           sum(CAST(y AS HUGEINT) * y) AS syy
    FROM daily
), t AS (
    SELECT n,
           CAST(n * sxy - sx * sy AS DOUBLE) AS cov_num,
           CAST(n * sxx - sx * sx AS DOUBLE) AS vx,
           CAST(n * syy - sy * sy AS DOUBLE) AS vy
    FROM s
)
SELECT CAST(n AS BIGINT) AS n_days,
       {sql_ieee_round(
           "CASE WHEN n >= 2 AND vx > 0 AND vy > 0"
           " THEN cov_num / sqrt(vx * vy) END", 6)} AS corr_cp,
       {sql_ieee_round(
           "CASE WHEN n >= 2"
           " THEN cov_num / CAST(n AS DOUBLE) / CAST(n - 1 AS DOUBLE)"
           " END", 6)} AS covar_cp
FROM t
"""


# ---------------------------------------------------------------------------
# 4. χ² independence test on the source × lang contingency table
# ---------------------------------------------------------------------------


def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² statistic for independence of document source and language:
    Σ (obs − exp)²/exp over the contingency table, exp = (row total ×
    col total) / N — the standard categorical-drift test (is the
    language mix the same across sources?).

    Scale shape: one data-sized groupBy builds the contingency table;
    marginals are broadcast joins over |sources| and |langs| rows; the
    χ² fold is a scalar aggregate over the tiny table. Every term is
    exact integer arithmetic until the final divide."""
    docs = t(spark, sf_dir, "documents")
    obs = docs.groupBy("source", "lang").agg(F.count("*").alias("o"))
    row_tot = obs.groupBy("source").agg(F.sum("o").alias("rt"))
    col_tot = obs.groupBy("lang").agg(F.sum("o").alias("ct"))
    n = obs.agg(F.sum("o").alias("n"))
    joined = (
        obs.join(F.broadcast(row_tot), "source")
        .join(F.broadcast(col_tot), "lang")
        .crossJoin(F.broadcast(n))
    )
    exp = F.col("rt") * F.col("ct") / F.col("n")
    term = F.pow(F.col("o") - exp, F.lit(2.0)) / exp
    dof = (
        (F.countDistinct("source") - 1) * (F.countDistinct("lang") - 1)
    ).cast("long")
    # nano-quantized term fold (r12 fold discipline): order-free sum of
    # exact 1e-9 integers instead of a raw double fold (terms reach ~1e4,
    # so nano units stay far inside int64)
    return joined.agg(
        ieee_round(
            F.sum(F.round(term * 1e9, 0).cast("long")) / 1e9, 4
        ).alias("chi2"),
        dof.alias("dof"),
    )


CHI_SQUARE_SQL = f"""
WITH obs AS (
    SELECT source, lang, count(*) AS o
    FROM documents GROUP BY source, lang
), rt AS (SELECT source, sum(o) AS rt FROM obs GROUP BY source),
   ct AS (SELECT lang, sum(o) AS ct FROM obs GROUP BY lang),
   n AS (SELECT sum(o) AS n FROM obs)
SELECT {sql_ieee_round(
    "sum(CAST(round(pow(o - rt * ct * 1.0 / n, 2.0)"
    " / (rt * ct * 1.0 / n) * 1000000000) AS BIGINT)) / 1000000000.0", 4
)} AS chi2,
       CAST((count(DISTINCT obs.source) - 1)
            * (count(DISTINCT obs.lang) - 1) AS BIGINT) AS dof
FROM obs JOIN rt USING (source) JOIN ct USING (lang) CROSS JOIN n
"""


# ---------------------------------------------------------------------------
# 5. Content-addressed table fingerprints
# ---------------------------------------------------------------------------


def _fp_expr():
    """60-bit md5 of the canonical row string — NULLs map to a sentinel
    that cannot collide with real values (col '\\x01' separator)."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "\x01",
                    F.col("doc_id").cast("string"),
                    F.coalesce(F.col("text"), F.lit("\x02null")),
                    F.coalesce(F.col("lang"), F.lit("\x02null")),
                    F.coalesce(F.col("source"), F.lit("\x02null")),
                    F.col("n_chars").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def table_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent dataset fingerprint: XOR of per-row content
    hashes + row count — the O(1)-state integrity check for comparing
    snapshots across reruns, engines, or migration steps (two datasets
    with equal (n_rows, xor_fp) are equal up to md5 collision, in any
    row order and any partitioning).

    Scale shape: one narrow map (hash) + one scalar aggregate — XOR is
    commutative/associative, so the combine is map-side and merge-order
    free, exactly why XOR (not a float sum, not a concat) is the right
    fold for a distributed fingerprint. Adding or removing the same row
    twice cancels — XOR fingerprints detect REPLACEMENT, while the
    paired count catches duplication; callers needing multiset
    sensitivity should hash (row, multiplicity)."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.withColumn("fp", _fp_expr())
        .agg(
            F.count("*").alias("n_rows"),
            F.expr("bit_xor(fp)").alias("xor_fp"),
        )
        .select(F.lit("documents").alias("table_name"), "n_rows", "xor_fp")
    )


TABLE_FINGERPRINTS_SQL = """
SELECT 'documents' AS table_name,
       count(*) AS n_rows,
       bit_xor(CAST(concat('0x', substring(md5(
           concat_ws(chr(1),
                     CAST(doc_id AS VARCHAR),
                     coalesce(text, chr(2) || 'null'),
                     coalesce(lang, chr(2) || 'null'),
                     coalesce(source, chr(2) || 'null'),
                     CAST(n_chars AS VARCHAR))), 1, 15)) AS BIGINT))
           AS xor_fp
FROM documents
"""


R6D_ENTRIES: dict[str, Entry] = {
    "sample_weighted": Entry(sample_weighted, SAMPLE_WEIGHTED_SQL),
    "skew_salted_join": Entry(skew_salted_join, SKEW_SALTED_JOIN_SQL),
    "agg_correlation": Entry(agg_correlation, AGG_CORRELATION_SQL),
    "chi_square_independence": Entry(chi_square_independence, CHI_SQUARE_SQL),
    "table_fingerprints": Entry(table_fingerprints, TABLE_FINGERPRINTS_SQL),
}
