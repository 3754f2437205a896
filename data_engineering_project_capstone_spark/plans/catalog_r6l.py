"""Round-6l catalog entries — experiment analysis and data-quality
forensics:

- ``ab_test_analysis``: deterministic hash-based A/B assignment of
  users (md5_bucket — the production traffic-split idiom) and the
  two-proportion readout per variant: users, converters, conversion
  rate, and the pooled two-proportion z statistic of B vs A.
- ``benford_digit_test``: first-significant-digit distribution of
  order totals vs Benford's law with the chi-square distance — the
  forensic data-quality screen for fabricated or truncated numeric
  columns.
- ``events_seasonality``: hour-of-day seasonal index (hourly event
  rate / overall mean rate) — the time-profile readout the hourly
  timeline rollup doesn't give.
- ``ri_audit``: referential-integrity audit — orphan counts for every
  FK edge of the schema in one pass of anti-join counts. The
  warehouse-wide health check a 100 TB ingest runs after every load.

Parity: assignments and digit extraction are integer/string ops;
ratios divide exact counts; the z statistic is one fixed expression
over exact integers on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round, md5_bucket
from .catalog import Entry, events_table, sql_ieee_round, t

# ---------------------------------------------------------------------------
# 1. A/B test analysis
# ---------------------------------------------------------------------------


def ab_test_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-variant conversion readout of a deterministic 50/50 user
    split: variant = md5_bucket(user_id) % 2, conversion = "user has a
    purchase in the corpus's final 3 days" (the whole-corpus any-purchase
    flag is 1 for essentially every user at ~2.2 events/user/day — a
    degenerate pooled rate of 1.0 puts 0/0 under the z statistic). Both
    variant rows carry the pooled two-proportion z of (B − A), guarded
    to NULL when a variant is empty or the pooled rate is 0/1.

    Scale shape: one user-level aggregate (any-purchase flag) → one
    2-group aggregate; the z statistic is computed by joining the two
    variant rows (2×2 broadcast). Assignment is a pure hash expression
    at the scan — no assignment table, identically rederivable by
    every downstream consumer."""
    ev = events_table(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    ref = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 3 DAYS")).alias("conv_start")
    )
    per_user = (
        ev.crossJoin(F.broadcast(ref))
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("conv_start")),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
    )
    assigned = per_user.select(
        md5_bucket(F.col("user_id").cast("string"), F.lit("ab"), 2).alias(
            "variant_id"
        ),
        "converted",
    )
    stats = assigned.groupBy("variant_id").agg(
        F.count("*").alias("n_users"),
        F.sum("converted").alias("n_converted"),
    )
    a = stats.filter(F.col("variant_id") == 0).select(
        F.col("n_users").alias("na"), F.col("n_converted").alias("ca")
    )
    b = stats.filter(F.col("variant_id") == 1).select(
        F.col("n_users").alias("nb"), F.col("n_converted").alias("cb")
    )
    # pooled two-proportion z = (pb − pa) / sqrt(p(1−p)(1/na + 1/nb)),
    # NULL when degenerate (empty variant, pooled rate 0 or 1)
    pooled = (F.col("ca") + F.col("cb")) / (F.col("na") + F.col("nb"))
    denom = F.sqrt(
        pooled * (1.0 - pooled) * (1.0 / F.col("na") + 1.0 / F.col("nb"))
    )
    z = F.when(
        denom > 0,
        (F.col("cb") / F.col("nb") - F.col("ca") / F.col("na")) / denom,
    )
    return (
        stats.crossJoin(F.broadcast(a.crossJoin(b)))
        .select(
            F.when(F.col("variant_id") == 0, "A").otherwise("B").alias(
                "variant"
            ),
            F.col("n_users").cast("long").alias("n_users"),
            F.col("n_converted").cast("long").alias("n_converted"),
            ieee_round(F.col("n_converted") / F.col("n_users"), 6).alias(
                "conv_rate"
            ),
            ieee_round(z, 6).alias("z_stat"),
        )
        .orderBy("variant")
    )


_SQL_AB_BUCKET = (
    "CAST(concat('0x', substring(md5(concat(CAST(user_id AS VARCHAR), "
    "':', 'ab')), 1, 15)) AS BIGINT) % 2"
)

AB_TEST_SQL = f"""
WITH ev AS (
    SELECT * FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
ref AS (SELECT max(ts) - INTERVAL 3 DAY AS conv_start FROM ev),
per_user AS (
    SELECT user_id,
           max(CASE WHEN event_type = 'purchase' AND ts > conv_start
                    THEN 1 ELSE 0 END) AS converted
    FROM ev, ref
    GROUP BY user_id
),
stats AS (
    SELECT {_SQL_AB_BUCKET} AS variant_id,
           count(*) AS n_users, sum(converted) AS n_converted
    FROM per_user
    GROUP BY 1
),
ab AS (
    SELECT a.n_users AS na, a.n_converted AS ca,
           b.n_users AS nb, b.n_converted AS cb
    FROM (SELECT * FROM stats WHERE variant_id = 0) a,
         (SELECT * FROM stats WHERE variant_id = 1) b
)
SELECT CASE WHEN variant_id = 0 THEN 'A' ELSE 'B' END AS variant,
       CAST(n_users AS BIGINT) AS n_users,
       CAST(n_converted AS BIGINT) AS n_converted,
       {sql_ieee_round("n_converted * 1.0 / n_users", 6)} AS conv_rate,
       {sql_ieee_round(
           "CASE WHEN sqrt(((ca + cb) * 1.0 / (na + nb)) * "
           "(1.0 - (ca + cb) * 1.0 / (na + nb)) * "
           "(1.0 / na + 1.0 / nb)) > 0 THEN "
           "(cb * 1.0 / nb - ca * 1.0 / na) / sqrt("
           "((ca + cb) * 1.0 / (na + nb)) * "
           "(1.0 - (ca + cb) * 1.0 / (na + nb)) * "
           "(1.0 / na + 1.0 / nb)) END", 6)} AS z_stat
FROM stats, ab
ORDER BY variant
"""


# ---------------------------------------------------------------------------
# 2. Benford first-digit test
# ---------------------------------------------------------------------------


def benford_digit_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of o_totalprice vs
    Benford's law, with each digit's chi-square contribution
    (obs − exp)²/exp. Digit extraction is string-based — the first
    character of the integer part — so both engines read the identical
    digit regardless of float formatting. Values below 1 are excluded:
    their first significant digit is not the first character, and a
    leading '0' would put 1/0 under ANSI in the Benford term.

    Scale shape: pure narrow map (digit expression) + one 9-group
    aggregate; cost is the scan."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digit = F.substring(
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
    ).cast("int")
    counts = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").alias("n")
    )
    tot = counts.agg(F.sum("n").alias("tot"))
    # Benford: P(d) = log10(1 + 1/d)
    exp = F.log10(1.0 + 1.0 / F.col("digit")) * F.col("tot")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.col("n").cast("long").alias("n"),
            ieee_round(F.col("n") / F.col("tot"), 6).alias("obs_freq"),
            ieee_round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias(
                "benford_freq"
            ),
            ieee_round((F.col("n") - exp) * (F.col("n") - exp) / exp, 6).alias(
                "chi2_term"
            ),
        )
        .orderBy("digit")
    )


BENFORD_SQL = f"""
WITH counts AS (
    SELECT CAST(substring(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                          1, 1) AS INTEGER) AS digit,
           count(*) AS n
    FROM orders WHERE o_totalprice >= 1
    GROUP BY 1
),
tot AS (SELECT sum(n) AS tot FROM counts)
SELECT digit, CAST(n AS BIGINT) AS n,
       {sql_ieee_round("n * 1.0 / tot", 6)} AS obs_freq,
       {sql_ieee_round("log10(1.0 + 1.0 / digit)", 6)} AS benford_freq,
       {sql_ieee_round(
           "(n - log10(1.0 + 1.0 / digit) * tot) * "
           "(n - log10(1.0 + 1.0 / digit) * tot) / "
           "(log10(1.0 + 1.0 / digit) * tot)", 6)} AS chi2_term
FROM counts, tot
ORDER BY digit
"""


# ---------------------------------------------------------------------------
# 3. Hour-of-day seasonality profile
# ---------------------------------------------------------------------------


def events_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal index: events in hour h divided by the
    uniform expectation (total/24). Index > 1 = hot hour. Exact
    integer counts; one 24-group aggregate."""
    ev = events_table(spark, sf_dir).filter(F.col("ts").isNotNull())
    hourly = ev.groupBy(F.hour("ts").alias("hour_of_day")).agg(
        F.count("*").alias("n")
    )
    tot = hourly.agg(F.sum("n").alias("tot"))
    return (
        hourly.crossJoin(F.broadcast(tot))
        .select(
            F.col("hour_of_day").cast("int").alias("hour_of_day"),
            F.col("n").cast("long").alias("n_events"),
            ieee_round(F.col("n") * 24.0 / F.col("tot"), 6).alias(
                "seasonal_index"
            ),
        )
        .orderBy("hour_of_day")
    )


EVENTS_SEASONALITY_SQL = f"""
WITH ev AS (SELECT * FROM events WHERE ts IS NOT NULL),
hourly AS (
    SELECT hour(ts) AS hour_of_day, count(*) AS n FROM ev GROUP BY 1
),
tot AS (SELECT sum(n) AS tot FROM hourly)
SELECT CAST(hour_of_day AS INTEGER) AS hour_of_day,
       CAST(n AS BIGINT) AS n_events,
       {sql_ieee_round("n * 24.0 / tot", 6)} AS seasonal_index
FROM hourly, tot
ORDER BY hour_of_day
"""


# ---------------------------------------------------------------------------
# 4. Referential-integrity audit
# ---------------------------------------------------------------------------


def ri_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan-row counts for every FK edge of the star: child rows
    whose key has no parent. One anti-join count per edge, unioned
    into the audit ledger (edge, child_rows, orphans).

    Scale shape: each anti-join shuffles on its key (or broadcasts the
    parent key set when the parent is a dim); counts aggregate
    map-side. The whole audit is embarrassingly parallel across
    edges."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    part = t(spark, sf_dir, "part")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")

    def edge(name, child, ck, parent, pk):
        orphans = child.join(
            parent.select(F.col(pk).alias(ck)).distinct(), ck, "left_anti"
        )
        return (
            child.agg(F.count("*").alias("child_rows"))
            .crossJoin(
                F.broadcast(orphans.agg(F.count("*").alias("orphans")))
            )
            .select(
                F.lit(name).alias("edge"),
                F.col("child_rows").cast("long").alias("child_rows"),
                F.col("orphans").cast("long").alias("orphans"),
            )
        )

    edges = [
        edge("lineitem.orderkey->orders", li, "l_orderkey", orders, "o_orderkey"),
        edge("lineitem.partkey->part", li, "l_partkey", part, "p_partkey"),
        edge("lineitem.suppkey->supplier", li, "l_suppkey", supp, "s_suppkey"),
        edge("orders.custkey->customer", orders, "o_custkey", cust, "c_custkey"),
        edge("customer.nationkey->nation", cust, "c_nationkey", nation, "n_nationkey"),
        edge("supplier.nationkey->nation", supp, "s_nationkey", nation, "n_nationkey"),
        edge("nation.regionkey->region", nation, "n_regionkey", region, "r_regionkey"),
    ]
    out = edges[0]
    for e in edges[1:]:
        out = out.unionAll(e)
    return out.orderBy("edge")


RI_AUDIT_SQL = """
SELECT 'lineitem.orderkey->orders' AS edge,
       (SELECT count(*) FROM lineitem) AS child_rows,
       (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
           AS orphans
UNION ALL
SELECT 'lineitem.partkey->part', (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
UNION ALL
SELECT 'lineitem.suppkey->supplier', (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
UNION ALL
SELECT 'orders.custkey->customer', (SELECT count(*) FROM orders),
       (SELECT count(*) FROM orders o WHERE NOT EXISTS
            (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'customer.nationkey->nation', (SELECT count(*) FROM customer),
       (SELECT count(*) FROM customer c WHERE NOT EXISTS
            (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
UNION ALL
SELECT 'supplier.nationkey->nation', (SELECT count(*) FROM supplier),
       (SELECT count(*) FROM supplier s WHERE NOT EXISTS
            (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
UNION ALL
SELECT 'nation.regionkey->region', (SELECT count(*) FROM nation),
       (SELECT count(*) FROM nation n WHERE NOT EXISTS
            (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey))
ORDER BY edge
"""


R6L_ENTRIES: dict[str, Entry] = {
    "ab_test_analysis": Entry(ab_test_analysis, AB_TEST_SQL),
    "benford_digit_test": Entry(benford_digit_test, BENFORD_SQL),
    "events_seasonality": Entry(events_seasonality, EVENTS_SEASONALITY_SQL),
    "ri_audit": Entry(ri_audit, RI_AUDIT_SQL),
}
