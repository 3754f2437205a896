"""Round-6k catalog entries — sampling-for-joins and business-analytics
composites:

- ``sample_universe``: UNIVERSE (join-consistent) sampling — sample the
  KEY domain (10% of customers by deterministic hash), then take every
  fact row belonging to a sampled key. Unlike row-Bernoulli sampling,
  this preserves join structure exactly (a sampled customer keeps ALL
  their orders and lineitems), which is what approximate-query engines
  sample for join estimation. Readout: sampled sizes plus the
  Horvitz-Thompson scale-up estimate of total revenue next to the true
  total.
- ``rfm_segments``: Recency/Frequency/Monetary customer segmentation —
  quintile scores per metric (ntile windows over per-customer
  aggregates, never raw facts) composed into a segment code, with
  per-segment counts and averages as the readout.
- ``revenue_pareto``: revenue concentration curve — parts ranked by
  revenue, cumulative share at each decile of the part population (the
  80/20 readout). Two-phase: per-part agg first, then windows over the
  AGGREGATE only.

Float parity: revenue flows in the exact int64 units of catalog_r6i
(``round(price·100)·(100−disc_pct)``); hash bucketing is the md5_bucket
idiom (bit-matched against its DuckDB twin in tests/test_properties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round, md5_bucket
from .catalog import Entry, sql_ieee_round, t
from .catalog_r6i import _SQL_UNITS, _units

# ---------------------------------------------------------------------------
# 1. Universe (join-consistent) sampling
# ---------------------------------------------------------------------------

_UNIV_MOD = 10  # keep bucket 0 → a 1-in-10 key-domain sample


def sample_universe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row ledger of a 10% universe sample over the customer key
    domain: sampled customers/orders/lineitems, the scaled revenue
    estimate, and the true total it estimates.

    Scale shape: membership is a pure hash expression on the key — no
    sample table to join for the customer scan, and the orders/lineitem
    sides inherit membership through their existing keys (orders by
    hash(o_custkey) directly — zero extra joins; lineitems via their
    order join, which the query needed anyway). Sampling COST is
    therefore one predicate per scan; only sampled rows shuffle. The
    estimate is Horvitz-Thompson: every unit in the 1/10 key sample
    up-weights by exactly 10."""
    in_sample = lambda key: md5_bucket(key, F.lit("univ"), _UNIV_MOD) == 0
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", _units().alias("units")
    )
    s_cust = cust.filter(in_sample(F.col("c_custkey").cast("string")))
    s_orders = orders.filter(in_sample(F.col("o_custkey").cast("string")))
    s_li = li.join(
        s_orders.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey"
    )
    n_cust = s_cust.agg(F.count("*").alias("n_cust_sampled"))
    n_ord = s_orders.agg(F.count("*").alias("n_orders_sampled"))
    s_rev = s_li.agg(
        F.count("*").alias("n_lineitems_sampled"),
        F.sum("units").alias("_su"),
    )
    true_rev = li.agg(F.sum("units").alias("_tu"))
    return (
        n_cust.crossJoin(F.broadcast(n_ord))
        .crossJoin(F.broadcast(s_rev))
        .crossJoin(F.broadcast(true_rev))
        .select(
            F.col("n_cust_sampled").cast("long").alias("n_cust_sampled"),
            F.col("n_orders_sampled").cast("long").alias("n_orders_sampled"),
            F.col("n_lineitems_sampled").cast("long").alias(
                "n_lineitems_sampled"
            ),
            ieee_round(
                F.col("_su") * _UNIV_MOD / 10000.0, 2
            ).alias("est_total_revenue"),
            ieee_round(F.col("_tu") / 10000.0, 2).alias("true_total_revenue"),
        )
    )


_SQL_IN_SAMPLE = (
    "CAST(concat('0x', substring(md5(concat({key}, ':', 'univ')), 1, 15)) "
    f"AS BIGINT) % {_UNIV_MOD} = 0"
)

SAMPLE_UNIVERSE_SQL = f"""
WITH s_cust AS (
    SELECT * FROM customer
    WHERE {_SQL_IN_SAMPLE.format(key="CAST(c_custkey AS VARCHAR)")}
),
s_orders AS (
    SELECT * FROM orders
    WHERE {_SQL_IN_SAMPLE.format(key="CAST(o_custkey AS VARCHAR)")}
),
s_li AS (
    SELECT {_SQL_UNITS} AS units
    FROM lineitem JOIN s_orders ON l_orderkey = o_orderkey
),
tot AS (SELECT sum({_SQL_UNITS}) AS tu FROM lineitem)
SELECT (SELECT count(*) FROM s_cust) AS n_cust_sampled,
       (SELECT count(*) FROM s_orders) AS n_orders_sampled,
       (SELECT count(*) FROM s_li) AS n_lineitems_sampled,
       {sql_ieee_round(
           "(SELECT sum(units) FROM s_li) * " + str(_UNIV_MOD) + " / 10000.0",
           2)} AS est_total_revenue,
       {sql_ieee_round("(SELECT tu FROM tot) / 10000.0", 2)}
           AS true_total_revenue
"""


# ---------------------------------------------------------------------------
# 2. RFM segmentation
# ---------------------------------------------------------------------------


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile segmentation: per customer, recency (days from last
    order to the corpus max date), frequency (order count), monetary
    (total spend in int units) → ntile(5) scores per metric → segment
    code "R{r}F{f}M{m}". Readout: per-segment customer count and mean
    monetary value, descending by count.

    Scale shape: ONE per-customer aggregate shuffle; the three ntile
    windows run over the per-customer AGGREGATE (|customers| rows, not
    facts). Global single-partition windows over the aggregate are the
    textbook quantile-scoring tradeoff — at extreme customer counts the
    ntile boundary derivation switches to the two-phase percentile
    pattern (clip_outliers); the segment readout itself is a ≤125-group
    aggregate. Recency is whole integer days; ties inside any window
    order by customer key, so quintile assignment is total-ordered and
    engine-identical."""
    # RFM is per-CUSTOMER: an anonymous order (NULL custkey) belongs to
    # no customer, and its NULL key as a window tiebreak sorts oppositely
    # across engines, permuting every quintile — excluded on both sides.
    # Caught by the degenerate-orders net.
    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey").isNotNull())
    ref = orders.agg(F.max("o_orderdate").alias("ref_d"))
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_d"),
            F.count("*").alias("freq"),
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ).alias("mon_cents"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "o_custkey",
            F.datediff(F.col("ref_d"), F.col("last_d")).alias("rec_days"),
            "freq",
            "mon_cents",
        )
    )
    # recency: smaller = better → ntile over ascending days gives score 1
    # to the most recent; invert so 5 = best, matching F/M orientation
    r_w = Window.orderBy(F.col("rec_days"), F.col("o_custkey"))
    f_w = Window.orderBy(F.desc("freq"), F.col("o_custkey"))
    m_w = Window.orderBy(F.desc("mon_cents"), F.col("o_custkey"))
    scored = per_cust.select(
        "o_custkey",
        "mon_cents",
        (6 - F.ntile(5).over(r_w)).alias("r_score"),
        (6 - F.ntile(5).over(f_w)).alias("f_score"),
        (6 - F.ntile(5).over(m_w)).alias("m_score"),
    )
    return (
        scored.groupBy(
            F.concat(
                F.lit("R"), F.col("r_score"),
                F.lit("F"), F.col("f_score"),
                F.lit("M"), F.col("m_score"),
            ).alias("segment")
        )
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            # average from the EXACT integer cents sum at readout (the
            # q1 pattern): avg(mon_cents/100.0) folds doubles in
            # engine-specific order, and at sf0.1 a segment of 22
            # customers landed the last ulp exactly on a 2dp boundary
            # (…905 → Spark .91 vs DuckDB .9). Caught by the first
            # full-catalog sf0.1 differential (round 10).
            ieee_round(
                F.sum("mon_cents") / F.lit(100.0) / F.count("*"), 2
            ).alias("avg_monetary"),
        )
        .orderBy(F.desc("n_customers"), "segment")
    )


RFM_SEGMENTS_SQL = """
WITH ref AS (SELECT max(o_orderdate) AS ref_d FROM orders
             WHERE o_custkey IS NOT NULL),
per_cust AS (
    SELECT o_custkey,
           date_diff('day', CAST(max(o_orderdate) AS DATE),
                     CAST((SELECT ref_d FROM ref) AS DATE)) AS rec_days,
           count(*) AS freq,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS mon_cents
    FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_custkey
),
scored AS (
    SELECT o_custkey, mon_cents,
           6 - ntile(5) OVER (ORDER BY rec_days, o_custkey) AS r_score,
           6 - ntile(5) OVER (ORDER BY freq DESC, o_custkey) AS f_score,
           6 - ntile(5) OVER (ORDER BY mon_cents DESC, o_custkey) AS m_score
    FROM per_cust
)
SELECT concat('R', r_score, 'F', f_score, 'M', m_score) AS segment,
       CAST(count(*) AS BIGINT) AS n_customers,
       {avg_sql} AS avg_monetary
FROM scored
GROUP BY 1
ORDER BY n_customers DESC, segment
""".format(avg_sql=sql_ieee_round("sum(mon_cents) / 100.0 / count(*)", 2))


# ---------------------------------------------------------------------------
# 3. Revenue concentration (Pareto) curve
# ---------------------------------------------------------------------------


def revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue share of the top-x% of parts, read out at
    each decile of the part population (the 80/20 curve).

    Scale shape: per-part aggregate (one shuffle with map-side
    combine), then rank + running-sum windows over the AGGREGATE
    (|parts| rows). The decile pick uses integer rank thresholds
    (rank ≤ ⌈n·d/10⌉), and cumulative sums are int64 units — the share
    is a ratio of exact integers at every decile."""
    per_part = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.sum(_units()).alias("u"))
    )
    w = Window.orderBy(F.desc("u"), F.col("l_partkey"))
    # per-part u keeps int64 (group size is SF-constant), but the
    # running sum approaches the GLOBAL revenue → DECIMAL(38,0)
    ranked = per_part.select(
        "u",
        F.row_number().over(w).alias("rnk"),
        F.sum(F.col("u").cast("decimal(38,0)")).over(
            Window.orderBy(F.desc("u"), F.col("l_partkey")).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ).alias("cum_u"),
    )
    n_tot = per_part.agg(
        F.count("*").alias("n"),
        F.sum(F.col("u").cast("decimal(38,0)")).alias("tot_u"),
    )
    # decile spine → integer ceil-rank targets, joined to the ranked agg
    targets = (
        spark.range(1, 11)
        .select(F.col("id").cast("int").alias("decile"))
        .crossJoin(F.broadcast(n_tot))
        .select(
            "decile",
            F.expr("(n * decile + 9) div 10").alias("rnk"),
            "tot_u",
        )
    )
    return (
        F.broadcast(targets)
        .join(ranked, "rnk")
        .select(
            "decile",
            F.col("rnk").cast("long").alias("n_parts"),
            ieee_round(
                F.col("cum_u").cast("double") / F.col("tot_u").cast("double"),
                6,
            ).alias("cum_share"),
        )
        .orderBy("decile")
    )


REVENUE_PARETO_SQL = f"""
WITH per_part AS (
    SELECT l_partkey, sum({_SQL_UNITS}) AS u
    FROM lineitem GROUP BY l_partkey
),
ranked AS (
    SELECT u,
           row_number() OVER (ORDER BY u DESC, l_partkey) AS rnk,
           sum(u) OVER (ORDER BY u DESC, l_partkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_u
    FROM per_part
),
tot AS (SELECT count(*) AS n, sum(u) AS tot_u FROM per_part)
SELECT CAST(d.decile AS INTEGER) AS decile,
       CAST(r.rnk AS BIGINT) AS n_parts,
       {sql_ieee_round("r.cum_u * 1.0 / t.tot_u", 6)} AS cum_share
FROM (SELECT unnest(range(1, 11)) AS decile) d
JOIN tot t ON TRUE
JOIN ranked r ON r.rnk = (t.n * d.decile + 9) // 10
ORDER BY decile
"""


# ---------------------------------------------------------------------------
# 4. Cross-source quantile normalization
# ---------------------------------------------------------------------------


def quantile_norm_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-normalize doc lengths ACROSS sources: each doc's
    within-source rank fraction q is mapped to the GLOBAL length
    distribution's value at q — the distribution-matching transform
    that removes per-source length bias before mixing corpora.

    Scale shape: within-source ranks are source-partitioned windows
    (source cardinality bounds the parallelism loss, not corpus size);
    the global distribution is compressed to a 101-point exact
    interpolated quantile grid (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``, the established parity pair) broadcast to every
    row — no corpus-wide single-partition window anywhere. Grid index
    = floor(q·100 + 0.5) (the ieee_round op sequence, so both engines
    pick the identical cell). Single-doc sources pin q = 0.5.

    NULL policy: n_chars NULL ranks as 0 (empty doc) — ranking on the
    raw column would diverge structurally (Spark windows default NULLS
    FIRST ascending, DuckDB NULLS LAST; caught by the degenerate-docs
    sweep). Keyless docs are excluded on both engines (r9 random-docs
    fuzz): doc_id is the output identity AND the rank tiebreak, and
    with tied lengths a NULL id has no defined rank position — the
    same NULLS-placement divergence, one column over. Same discipline
    as shard_balance."""
    docs = t(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    ).select(
        "doc_id", "source", F.coalesce("n_chars", F.lit(0)).alias("nc")
    )
    grid = docs.agg(
        F.expr(
            "percentile(nc, array("
            + ", ".join(str(i / 100.0) for i in range(101))
            + "))"
        ).alias("grid")
    )
    w = Window.partitionBy("source").orderBy("nc", "doc_id")
    ranked = docs.select(
        "doc_id",
        "source",
        F.col("nc").alias("n_chars"),
        F.row_number().over(w).alias("r"),
        F.count("*").over(Window.partitionBy("source")).alias("n_s"),
    )
    q = F.when(F.col("n_s") > 1, (F.col("r") - 1) / (F.col("n_s") - 1)).otherwise(
        F.lit(0.5)
    )
    idx = F.floor(q * 100 + 0.5).cast("int")
    return (
        ranked.crossJoin(F.broadcast(grid))
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            ieee_round(F.element_at("grid", idx + 1), 2).alias("norm_chars"),
        )
        .orderBy("doc_id")
    )


QUANTILE_NORM_SQL = """
WITH d AS (
    SELECT doc_id, source, coalesce(n_chars, 0) AS n_chars FROM documents
    WHERE doc_id IS NOT NULL
),
grid AS (
    SELECT quantile_cont(n_chars, [{qs}]) AS g FROM d
),
ranked AS (
    SELECT doc_id, source, n_chars,
           row_number() OVER (PARTITION BY source
                              ORDER BY n_chars, doc_id) AS r,
           count(*) OVER (PARTITION BY source) AS n_s
    FROM d
)
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
       {norm} AS norm_chars
FROM ranked, grid
ORDER BY doc_id
""".format(
    qs=", ".join(str(i / 100.0) for i in range(101)),
    norm=sql_ieee_round(
        "g[CAST(floor(CASE WHEN n_s > 1 THEN (r - 1) * 1.0 / (n_s - 1) "
        "ELSE 0.5 END * 100 + 0.5) AS INTEGER) + 1]",
        2,
    ),
)


R6K_ENTRIES: dict[str, Entry] = {
    "sample_universe": Entry(sample_universe, SAMPLE_UNIVERSE_SQL),
    "rfm_segments": Entry(rfm_segments, RFM_SEGMENTS_SQL),
    "revenue_pareto": Entry(revenue_pareto, REVENUE_PARETO_SQL),
    "quantile_norm_lengths": Entry(quantile_norm_lengths, QUANTILE_NORM_SQL),
}
