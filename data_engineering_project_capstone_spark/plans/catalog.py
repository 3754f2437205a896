"""Oracle-paired query catalog — the driver correctness surface.

Every operator family from SURVEY.md §2 is expressed here twice: once as a
PySpark DataFrame plan (``spark_fn(spark, sf_dir) -> DataFrame``) and once
as ANSI SQL that DuckDB runs on the same parquet files. The driver compares
row count + schema + order-insensitive value hash at sf=0.01.

Cross-engine parity rules (hard-won, keep these):

- **Name parity**: every computed column is aliased identically on both
  sides (the driver sorts columns by name before hashing).
- **Type parity**: DuckDB ``SUM(int)`` returns HUGEINT → always
  ``CAST(... AS BIGINT)``; Spark ``year()`` returns int32 while DuckDB
  ``EXTRACT`` returns int64 → cast Spark to ``long``.
- **Float parity**: round aggregates on BOTH sides (the reference rounds
  to 2dp everywhere anyway: ``dataprep.py:57-66``). Never emit a raw
  double → string cast; use printf-style formatting on both sides.
- **Fold parity** (r12, after the kmeans_embeddings incident — a raw
  double sum landed EXACTLY on a 4dp half boundary and the engines'
  fold orders split it): never feed a RAW double sum into a rounded
  readout. Money-like summands fold as exact integer cents/units
  (DECIMAL(38,0) where a 100 TB row count overflows int64, q1 idiom);
  already-rounded summands fold their exact fixed-point integers
  (kmeans d×1e6); transcendental terms (ln/pow ratios: KL, χ²)
  quantize each term to a 1e-9 integer first — order-free and immune
  to last-ulp libm differences. Both engines must compute the SAME
  integers; rounding/guards mirror ieee_round / the round-half pin.
  Non-finite inputs: integer folds must keep double-sum semantics
  explicitly (flags: any NaN or mixed ±inf → NaN, else ±inf — see
  events_multires_rollup) or pin the domain loudly (money contract).
- **Null parity**: Spark ``pivot`` yields null for empty cells where a
  SQL ``COUNT(CASE...)`` yields 0 → coalesce the Spark side.
- **Regex-class parity** (r11, found by tests/test_weirdtext.py): Java
  ``\\s`` is ``[ \\t\\n\\x0b\\f\\r]`` but RE2's lacks the VERTICAL TAB
  (and ``\\S`` the complement) — a document containing ``\\x0b``
  tokenizes differently. The Spark side keeps the idiomatic ``\\s+``;
  every ORACLE regex spells the class out explicitly
  (``[ \\t\\n\\x0b\\f\\r]+``), including ``\\s`` embedded in bigger
  classes (text_bpe_count) and ``\\S`` complements (text_readability).
  Never write bare ``\\s``/``\\S`` in oracle SQL.
- **Unicode envelope** (r11): case-folding with SPECIAL mappings
  (İ, ß, ligatures, final sigma), ``levenshtein`` (code points vs
  UTF-8 bytes) and ``reverse`` (code points vs graphemes) are
  engine-structural — kept out of oracle-paired text paths; the
  divergences are machine-pinned in
  tests/test_weirdtext.py::test_string_semantics_envelope.

Scale notes are on each entry: which side broadcasts, where the shuffle
is, why the plan survives 1000 executors.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round


def _ensure_session_conf(spark: SparkSession) -> None:
    """The driver passes its own SparkSession — pin the confs results and
    performance depend on, regardless of how that session was built: UTC
    timestamps (oracle comparability), nanos-as-long parquet reads
    (events.ts has shipped as TIMESTAMP(NANOS)), and the
    InferFiltersFromGenerate exclusion (the inferred size(e)>0 filter
    below explode re-derives collapsed shingle/gram pipelines per row —
    quadratic with tokenizers in transform lambdas; see session.py)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # append, don't overwrite: the caller's session may carry its own
    # optimizer exclusions, and clobbering them would silently change
    # the caller's plans outside this catalog
    rule = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    existing = spark.conf.get("spark.sql.optimizer.excludedRules", "") or ""
    rules = [r for r in (x.strip() for x in existing.split(",")) if r]
    if rule not in rules:
        rules.append(rule)
    spark.conf.set("spark.sql.optimizer.excludedRules", ",".join(rules))


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_session_conf(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` normalized to TIMESTAMP (UTC session tz).

    The testdata has shipped ``ts`` two ways across rounds: TIMESTAMP(NANOS)
    (which nanosAsLong surfaces as epoch-ns BIGINT) and plain timestamp[us]
    (read as TIMESTAMP_NTZ). Branch on the *actual* read schema so both
    layouts produce the identical TIMESTAMP column DuckDB sees:

    - LongType  → epoch ns → ``timestamp_micros(ts div 1000)`` (the same
      micros truncation DuckDB applies to nanos).
    - timestamp / timestamp_ntz → cast to TIMESTAMP; with the session tz
      pinned to UTC the wall-clock is interpreted as UTC, matching the
      oracle exactly.
    """
    from pyspark.sql import types as T

    ev = t(spark, sf_dir, "events")
    ts_type = ev.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return ev.withColumn("ts", F.col("ts").cast("timestamp"))


def sql_ieee_round(expr: str, scale: int = 2) -> str:
    """DuckDB twin of functions.scalar.ieee_round — same IEEE op sequence."""
    m = float(10**scale)
    return f"floor(({expr}) * {m} + 0.5) / {m}"


@dataclass(frozen=True)
class Entry:
    spark_fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None → driver does rows-only check
    doc: str = ""


# ---------------------------------------------------------------------------
# Flagship analogs (capstone Q1-Q3 re-expressed on the testdata star schema;
# reference README.md:169-214). orders≈travelers fact, customer≈airports,
# nation≈city, region≈statistics.
# ---------------------------------------------------------------------------


def q1_avg_price_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone Q1 shape (README.md:172-179): per-dim average over the fact,
    re-joined to a second dim. Dims broadcast; single shuffle on n_name."""
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            # 6dp: decimal ties at 2dp (sum-of-2dp / n) are common; at 6dp
            # they're vanishing, and cross-engine ulp noise is << 5e-7
            F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(F.col("avg_price").desc())
    )


Q1_SQL = """
SELECT n_name,
       round(avg(o_totalprice), 6) AS avg_price,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY avg_price DESC
"""


def q2_count_by_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone Q2 shape (README.md:185-194): count per dim through a
    3-hop join chain fact→dim→dim→dim, ordered by a dim attribute."""
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    return (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name", "r_name")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "n_name")
    )


Q2_SQL = """
SELECT n_name, r_name, count(*) AS cnt
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
ORDER BY cnt DESC, n_name
"""


def q3_pct_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone Q3 shape (README.md:200-214): per-group count cross-joined
    with a 1-row grand total (J10), pct-of-total (P17/P18). The total is a
    broadcast cross join — no shuffle of the grouped side."""
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    per_nation = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("cnt"))
    )
    total = orders.agg(F.count("*").alias("total"))
    return (
        per_nation.crossJoin(F.broadcast(total))
        .select(
            "n_name",
            "cnt",
            ieee_round(F.lit(100.0) * F.col("cnt") / F.col("total"), 2).alias(
                "pct_of_total"
            ),
        )
        .orderBy(F.col("pct_of_total").desc(), "n_name")
    )


Q3_SQL = """
WITH per_nation AS (
    SELECT n_name, count(*) AS cnt
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
), tot AS (SELECT count(*) AS total FROM orders)
SELECT n_name, cnt,
       floor((100.0 * cnt / total) * 100.0 + 0.5) / 100.0 AS pct_of_total
FROM per_nation CROSS JOIN tot
ORDER BY pct_of_total DESC, n_name
"""


# ---------------------------------------------------------------------------
# Projection / filter / per-row transforms (SURVEY §2.2)
# ---------------------------------------------------------------------------


def proj_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P5/P6/P7: projection + literal equality/inequality/null filters.
    All predicates reach the parquet scan (PushedFilters)."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") != "A")
        & (F.col("l_quantity") > 30)
        & F.col("l_shipdate").isNotNull()
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


PROJ_FILTER_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
FROM lineitem
WHERE l_returnflag <> 'A' AND l_quantity > 30 AND l_shipdate IS NOT NULL
"""


def derived_cast_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9-P12: casts, arithmetic derived column, 2dp round (the reference's
    ratio+round pattern, dataprep.py:32,57-66)."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty_int"),
        # ieee_round, not F.round: row-level 2dp×2dp products hit decimal
        # ties where Spark/DuckDB round() disagree
        ieee_round(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 2
        ).alias("net_price"),
        ieee_round(F.col("l_extendedprice") / F.col("l_quantity"), 2).alias(
            "unit_price"
        ),
    )


DERIVED_CAST_ROUND_SQL = f"""
SELECT l_orderkey, l_linenumber,
       CAST(l_quantity AS INTEGER) AS qty_int,
       {sql_ieee_round("l_extendedprice * (1.0 - l_discount)")} AS net_price,
       {sql_ieee_round("l_extendedprice / l_quantity")} AS unit_price
FROM lineitem
"""


def string_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13: delimiter split → columns (reference splits coords/regions,
    dataprep.py:114,122)."""
    part = t(spark, sf_dir, "part")
    # F.get, not getItem: under ANSI mode getItem throws
    # INVALID_ARRAY_INDEX on a single-token name, while the SQL-standard
    # (and DuckDB list[2]) behavior is NULL for the missing token.
    # Caught by the degenerate-part net.
    return part.select(
        "p_partkey",
        F.get(F.split(F.col("p_name"), " "), 0).alias("name_adj"),
        F.get(F.split(F.col("p_name"), " "), 1).alias("name_noun"),
    )


STRING_SPLIT_SQL = """
SELECT p_partkey,
       string_split(p_name, ' ')[1] AS name_adj,
       string_split(p_name, ' ')[2] AS name_noun
FROM part
"""


def cond_compass_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14: sign-conditional compass formatting (reference dataprep.py:
    144-145) on acctbal. printf on both sides → identical strings.

    NULL balance → NULL compass, made EXPLICIT on the Spark side:
    Spark's format_string renders a NULL argument as the literal
    string "null" (Java String.format), so without the guard a NULL
    balance becomes "nullN" here while DuckDB's printf propagates
    NULL — pinned by the degenerate-customer net.

    Round-half parity (random-dims fuzz, r9): the raw %.2f formatters
    DISAGREE at exact binary halves — Java String.format rounds
    128.125 HALF_UP to "128.13", C printf half-even to "128.12" — so
    both engines format the ieee_round-ed value instead: after
    floor(x*100+0.5)/100 the double sits on the 2dp grid and neither
    printf has a tie left to break."""
    cust = t(spark, sf_dir, "customer")
    mag = F.format_string("%.2f", ieee_round(F.abs(F.col("c_acctbal")), 2))
    return cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal").isNull(), F.lit(None).cast("string"))
        .when(F.col("c_acctbal") < 0, F.concat(mag, F.lit("S")))
        .otherwise(F.concat(mag, F.lit("N")))
        .alias("bal_compass"),
    )


COND_COMPASS_SQL = f"""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0
            THEN printf('%.2f', {sql_ieee_round("abs(c_acctbal)", 2)}) || 'S'
            ELSE printf('%.2f', {sql_ieee_round("abs(c_acctbal)", 2)}) || 'N'
       END AS bal_compass
FROM customer
"""


def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P15: year/month/day extraction (reference dataprep.py:159-160,
    215-217). Cast to long: DuckDB EXTRACT returns int64."""
    orders = t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("o_day"),
    )


DATE_PARTS_SQL = """
SELECT o_orderkey,
       EXTRACT(year FROM o_orderdate) AS o_year,
       EXTRACT(month FROM o_orderdate) AS o_month,
       EXTRACT(day FROM o_orderdate) AS o_day
FROM orders
"""


def sas_date_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P16: SAS day-offset → date as a built-in (replaces the reference's
    only Python UDF, dataprep.py:210-212). Offset synthesized from
    l_linenumber * l_orderkey for variety; null-safe."""
    li = t(spark, sf_dir, "lineitem")
    days = (F.col("l_orderkey") % 20000).cast("int")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.date_add(F.lit("1960-01-01").cast("date"), days).alias("sas_date"),
    )


SAS_DATE_SQL = """
SELECT l_orderkey, l_linenumber,
       DATE '1960-01-01' + CAST(l_orderkey % 20000 AS INTEGER) AS sas_date
FROM lineitem
"""


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------


def join_left_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2-style left outer join keeping unmatched dim rows (zero counts)."""
    nation = t(spark, sf_dir, "nation")
    customer = t(spark, sf_dir, "customer")
    per_nation = customer.groupBy("c_nationkey").agg(
        F.count("*").alias("n_customers")
    )
    return nation.join(
        per_nation, nation["n_nationkey"] == per_nation["c_nationkey"], "left"
    ).select(
        "n_nationkey",
        "n_name",
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
    )


JOIN_LEFT_SQL = """
SELECT n_nationkey, n_name,
       COALESCE(cnt.n_customers, 0) AS n_customers
FROM nation
LEFT JOIN (
    SELECT c_nationkey, count(*) AS n_customers
    FROM customer GROUP BY c_nationkey
) cnt ON n_nationkey = cnt.c_nationkey
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: existence filtering without dim columns (the honest
    primitive behind the reference's dim-filtering inner joins, J6)."""
    supplier = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem")
    return supplier.join(
        li, supplier["s_suppkey"] == li["l_suppkey"], "left_semi"
    ).select("s_suppkey", "s_name")


JOIN_SEMI_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no high-value order (every customer
    has *some* order in this data, so the filter keeps the result
    non-trivial at every scale factor)."""
    customer = t(spark, sf_dir, "customer")
    big_orders = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return customer.join(
        big_orders, customer["c_custkey"] == big_orders["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_totalprice > 300000
)
"""


def join_multiway_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: multi-hop chain lineitem→orders→customer→nation→region with a
    revenue aggregate (TPC-H Q5 shape). Only lineitem⋈orders shuffles;
    every dim is broadcast."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            # sum per-row-rounded values: the true sum then sits on the 2dp
            # grid, so the final round never lands near a tie boundary
            F.round(
                F.sum(
                    ieee_round(
                        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                        2,
                    )
                ),
                2,
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("r_name")
    )


JOIN_MULTIWAY_SQL = f"""
SELECT r_name,
       round(sum({sql_ieee_round("l_extendedprice * (1.0 - l_discount)")}), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4)
# ---------------------------------------------------------------------------


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: distinct on a column subset (city-dim dedup shape)."""
    customer = t(spark, sf_dir, "customer")
    return customer.select("c_nationkey", "c_mktsegment").distinct()


AGG_DISTINCT_SQL = """
SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
"""


def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: pivot long→wide (the reference's 5-merge race pivot done as one
    shuffle; dataprep.py:26-32). Explicit value list skips the discovery
    pass; coalesce matches SQL's 0-for-empty."""
    orders = t(spark, sf_dir, "orders")
    wide = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))  # Spark 4 rejects count(*) inside pivot
    )
    return wide.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("cnt_open"),
        F.coalesce(F.col("F"), F.lit(0)).alias("cnt_finished"),
        F.coalesce(F.col("P"), F.lit(0)).alias("cnt_pending"),
    )


AGG_PIVOT_SQL = """
SELECT o_orderpriority,
       CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS cnt_open,
       CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS cnt_finished,
       CAST(count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS cnt_pending
FROM orders
GROUP BY o_orderpriority
"""


def dedup_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 made deterministic: the reference's sort+drop_duplicates
    (dataprep.py:40) as row_number()==1 over an explicit order — latest
    order per customer, orderkey as tiebreak."""
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


DEDUP_FIRST_WINS_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
FROM orders
QUALIFY row_number() OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
) = 1
"""


def agg_stats_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A5/A6/A7 composite: TPC-H Q1 pricing summary — the canonical
    partial+final hash-agg workload (8 aggregates, 2 group keys)."""
    li = t(spark, sf_dir, "lineitem")
    disc = ieee_round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 2
    )
    charge = ieee_round(
        F.col("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount"))
        * (F.lit(1.0) + F.col("l_tax")),
        2,
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # sums of exact-2dp inputs: final round is tie-free
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            # avgs at 6dp: tie probability negligible, ulp noise << 5e-7
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


AGG_STATS_SQL = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum({sql_ieee_round("l_extendedprice * (1.0 - l_discount)")}), 2)
           AS sum_disc_price,
       round(sum({sql_ieee_round("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")}), 2)
           AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Windows / ranking (SURVEY §2.8 — introduced for IDENTITY keys + top-k)
# ---------------------------------------------------------------------------


def surrogate_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IDENTITY-key replacement (SURVEY §7): dense row_number over an
    explicit order, on a dimension-sized input."""
    nation = t(spark, sf_dir, "nation")
    # Explicit NULLS LAST (Spark defaults NULLS FIRST, DuckDB NULLS
    # LAST) and a key tiebreak (duplicate names otherwise make the
    # numbering nondeterministic). Caught by the degenerate-nation net.
    w = Window.orderBy(F.asc_nulls_last("n_name"), F.asc("n_nationkey"))
    return nation.select(
        F.row_number().over(w).cast("long").alias("nation_id"), "n_name"
    )


SURROGATE_IDS_SQL = """
SELECT CAST(row_number() OVER (ORDER BY n_name NULLS LAST, n_nationkey) AS BIGINT)
           AS nation_id,
       n_name
FROM nation
"""


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by totalprice per customer nation (deterministic
    tiebreak on orderkey). Both rank keys pin NULLS LAST explicitly:
    at a price tie, an unpinned NULL orderkey outranks a real key on
    Spark (ASC NULLS FIRST) and loses on DuckDB (NULLS LAST) — caught
    by the random-corpus fuzz net."""
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    joined = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("o_totalprice").desc_nulls_last(),
        F.col("o_orderkey").asc_nulls_last(),
    )
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "c_nationkey", F.col("rk").cast("long").alias("rk"), "o_orderkey",
            "o_totalprice",
        )
    )


TOPK_SQL = """
SELECT c_nationkey, CAST(rk AS BIGINT) AS rk, o_orderkey, o_totalprice
FROM (
    SELECT c_nationkey, o_orderkey, o_totalprice,
           row_number() OVER (
               PARTITION BY c_nationkey
               ORDER BY o_totalprice DESC NULLS LAST, o_orderkey NULLS LAST
           ) AS rk
    FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rk <= 3
"""


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.6 — free in the new engine)
# ---------------------------------------------------------------------------


def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    supplier = t(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("nationkey"))
        .union(supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


SET_UNION_SQL = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
"""


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations with customers but no suppliers."""
    customer = t(spark, sf_dir, "customer")
    supplier = t(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("nationkey"))
        .exceptAll(supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


SET_EXCEPT_SQL = """
SELECT DISTINCT nationkey FROM (
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey FROM supplier
)
"""


# ---------------------------------------------------------------------------
# Events: time-series / JSON (events table)
# ---------------------------------------------------------------------------


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch tumbling-window aggregate: per-hour per-type counts + sums
    (the batch twin of the streaming surface)."""
    ev = events_table(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
"""


def events_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-full JSON parsing: from_json into a typed struct (vs the
    path-extraction in events_json) + regexp extraction on a string key."""
    from pyspark.sql import types as T

    ev = t(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    return ev.select(
        "event_id",
        F.from_json("props", schema).getField("k").alias("k_typed"),
        F.regexp_extract("event_type", "^([a-z]+)", 1).alias("type_word"),
    )


EVENTS_JSON_STRUCT_SQL = """
SELECT event_id,
       -- json_valid guard: matches Spark from_json's NULL-on-malformed
       CASE WHEN json_valid(props)
            THEN CAST(json_extract(props, '$.k') AS BIGINT) END AS k_typed,
       regexp_extract(event_type, '^([a-z]+)', 1) AS type_word
FROM events
"""


def events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the props column."""
    ev = t(spark, sf_dir, "events")  # no ts needed; raw read is fine
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


EVENTS_JSON_SQL = """
SELECT event_id,
       -- json_valid guard: DuckDB's json_extract THROWS on malformed
       -- JSON where Spark's get_json_object returns NULL; the guard
       -- matches Spark's NULL-on-malformed contract
       CASE WHEN json_valid(props)
            THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k
FROM events
"""


# ---------------------------------------------------------------------------
# Text analysis on documents (north-star extension surface)
# ---------------------------------------------------------------------------


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + length stats per document (whitespace tokenizer),
    all JVM-side — no UDF."""
    docs = t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), "\\s+")
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_computed"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
    )


TEXT_TOKEN_STATS_SQL = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_computed,
       CAST(len(string_split_regex(trim(coalesce(text, '')), '[ \\t\\n\\x0b\\f\\r]+')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split_regex(trim(coalesce(text, '')), '[ \\t\\n\\x0b\\f\\r]+'))) AS BIGINT)
           AS n_unique_tokens
FROM documents
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup fingerprint: md5 of normalized text (lowercase, collapsed
    whitespace). The grouping key for exact dedup at any scale."""
    docs = t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))), "\\s+", " ")
    return docs.select("doc_id", F.md5(norm).alias("fingerprint"))


DOC_FINGERPRINT_SQL = """
SELECT doc_id,
       md5(regexp_replace(lower(trim(coalesce(text, ''))), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')) AS fingerprint
FROM documents
"""


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via fingerprint group-by: canonical doc (min id) per
    distinct content + dup count. Pure shuffle-on-hash — scales linearly."""
    docs = t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))), "\\s+", " ")
    return (
        docs.select("doc_id", F.md5(norm).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


DEDUP_EXACT_SQL = """
SELECT md5(regexp_replace(lower(trim(coalesce(text, ''))), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')) AS fingerprint,
       min(doc_id) AS canonical_doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Sessionization / rollup / as-of join
# ---------------------------------------------------------------------------


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (streaming.events.sessionize_batch): 30-min-gap
    sessions per user via lag + cumulative sum — one shuffle on user_id."""
    from ..streaming.events import sessionize_batch

    return sessionize_batch(events_table(spark, sf_dir), gap_minutes=30)


EVENTS_SESSIONIZE_SQL = """
WITH g AS (
    SELECT event_id, ts, user_id, value,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR date_diff('second', lag(ts) OVER w, ts) > 1800
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WHERE ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
    SELECT *, sum(is_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
    ) AS session_seq
    FROM g
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM s
GROUP BY user_id, session_seq
"""


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status → priority → grand total).

    The grand-total grouping set is computed as an explicit global
    aggregate and unioned in: Spark's Expand-based rollup emits ZERO
    rows on empty input, while the SQL standard (and DuckDB) define the
    () set as a global aggregate — exactly one row, count 0 — and an
    empty scan is a legitimate state at scale (a date-pruned partition
    with no data). The non-global sets keep the native single-scan
    Expand; grouping_id() drops Expand's own () row so the union never
    double-counts."""
    orders = t(spark, sf_dir, "orders")
    aggs = [
        F.count("*").alias("cnt"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    ]
    sets = (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(*aggs, F.grouping_id().alias("_gid"))
        .filter(F.col("_gid") != 3)
        .drop("_gid")
    )
    total = orders.agg(*aggs).select(
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("string").alias("o_orderpriority"),
        "cnt",
        "sum_price",
    )
    return sets.unionByName(total).orderBy("o_orderstatus", "o_orderpriority")


AGG_ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS cnt,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus, o_orderpriority
"""


def join_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators.asof.asof_join): each purchase event matched
    to the user's most recent signup at-or-before it. Output rows are
    identified by purchase event_id, so keyless purchases are excluded
    on BOTH engines (the oracle's PARTITION BY p.event_id would
    collapse two NULL-id purchases into one row while the operator
    keeps both — random-events fuzz net); the operator itself drops
    timeless/keyless RIGHT rows (see asof_join). Duplicate-id policy
    (mixdup corpus, r11): physical copies of a purchase are ONE output
    row — the `.distinct()` below collapses them, as the oracle's
    PARTITION BY p.event_id already does; without it k copies emit k
    identical rows. One extra map-combined hash agg, nearly free: ids
    are near-unique, so pre-shuffle combine removes almost nothing
    and the exchange carries the same rows the asof shuffle would."""
    from ..operators.asof import asof_join

    ev = events_table(spark, sf_dir)
    purchases = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & F.col("event_id").isNotNull()
        )
        .select("event_id", "user_id", "ts")
        .distinct()
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        purchases,
        signups,
        on=["user_id"],
        right_cols=["event_id", "value"],
        prefix="signup_",
        tiebreak="event_id",
    )
    return out.select(
        "event_id", "user_id", "ts", "signup_event_id",
        F.round("signup_value", 2).alias("signup_value"),
    )


# Window form instead of DuckDB's native ASOF JOIN: ASOF picks an
# ARBITRARY right row when two signups share (user_id, ts), while the
# Spark asof_join breaks that tie on greatest event_id — the explicit
# (ts DESC, event_id DESC) order makes the oracle deterministic too.
JOIN_ASOF_SQL = """
SELECT event_id, user_id, ts, signup_event_id, signup_value
FROM (
    SELECT p.event_id, p.user_id, p.ts,
           s.event_id AS signup_event_id,
           round(s.value, 2) AS signup_value,
           row_number() OVER (
               PARTITION BY p.event_id
               ORDER BY s.ts DESC, s.event_id DESC
           ) AS rn
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase' AND event_id IS NOT NULL) p
    LEFT JOIN (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'signup' AND event_id IS NOT NULL
                 AND user_id IS NOT NULL AND ts IS NOT NULL) s
      ON p.user_id = s.user_id AND s.ts <= p.ts
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Extended SQL surface: cube, unpivot, percentiles, running windows,
# range join, merge/SCD2 emulation
# ---------------------------------------------------------------------------


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping combinations.

    Grand-total set unioned in as a global aggregate so the empty-scan
    limit matches the SQL standard (one () row, count 0) — see
    agg_rollup for the rationale; Spark's native Expand emits nothing
    on empty input."""
    li = t(spark, sf_dir, "lineitem")
    aggs = [
        F.count("*").alias("cnt"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    ]
    sets = (
        li.cube("l_returnflag", "l_linestatus")
        .agg(*aggs, F.grouping_id().alias("_gid"))
        .filter(F.col("_gid") != 3)
        .drop("_gid")
    )
    total = li.agg(*aggs).select(
        F.lit(None).cast("string").alias("l_returnflag"),
        F.lit(None).cast("string").alias("l_linestatus"),
        "cnt",
        "sum_qty",
    )
    return sets.unionByName(total).orderBy("l_returnflag", "l_linestatus")


AGG_CUBE_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS cnt,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


def unpivot_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot wide numeric columns to long (metric, value) rows — the
    inverse of the capstone's race pivot (A3)."""
    part = t(spark, sf_dir, "part")
    return part.unpivot(
        "p_partkey",
        ["p_size", "p_retailprice"],
        "metric",
        "value",
    ).withColumn("value", F.col("value").cast("double"))


UNPIVOT_SQL = """
SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice FROM part
"""


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (both engines implement
    linear interpolation: Spark percentile / DuckDB quantile_cont)."""
    orders = t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
            F.count("*").alias("cnt"),
        )
        .orderBy("o_orderstatus")
    )


AGG_PERCENTILES_SQL = """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       count(*) AS cnt
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running order total ordered by date (cumulative window
    aggregate — per-key sort, no global ordering). NULL sort keys are
    pinned NULLS LAST explicitly: Spark windows default NULLS FIRST and
    DuckDB NULLS LAST, so an undated order would silently shift every
    running total in its partition cross-engine (degenerate-orders
    NULL-measure net). The running sum is EXACT INTEGER CENTS divided
    at readout: a raw double window-sum is association-sensitive, and
    DuckDB aggregates window frames through a segment tree while Spark
    accumulates sequentially — the last-ulp difference flips a 2dp
    rounding boundary (caught by the random-corpus fuzz net at
    2278.615)."""
    orders = t(spark, sf_dir, "orders")
    keys = [
        F.col("o_orderdate").asc_nulls_last(),
        F.col("o_orderkey").asc_nulls_last(),
    ]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(*keys)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        ieee_round(F.sum(cents).over(w) / 100.0, 2).alias("running_total"),
        F.row_number().over(
            Window.partitionBy("o_custkey").orderBy(*keys)
        ).cast("long").alias("order_seq"),
    )


WINDOW_RUNNING_SQL = f"""
SELECT o_custkey, o_orderkey,
       {sql_ieee_round('''sum(CAST(round(o_totalprice * 100) AS BIGINT))
           OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate NULLS LAST, o_orderkey NULLS LAST
                 ROWS UNBOUNDED PRECEDING) / 100.0''', 2)}
           AS running_total,
       CAST(row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate NULLS LAST, o_orderkey NULLS LAST
       ) AS BIGINT) AS order_seq
FROM orders
"""


def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: lineitems shipped within 30 days after their order date.

    Spark has no native range join — a naive inequality join becomes a
    broadcast-nested-loop. Scale strategy: equi-join on the natural key
    carries the range predicate as a post-join filter, so Catalyst keeps a
    hash join and the range check is free. (For keyless pure-range joins,
    bucketize the range key and explode to neighbor buckets.)
    """
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (
                F.col("l_shipdate")
                <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
            )
        )
        .select("l_orderkey", "l_linenumber", "l_shipdate", "o_orderdate")
    )


JOIN_RANGE_SQL = """
SELECT l_orderkey, l_linenumber, l_shipdate, o_orderdate
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate
  AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
"""


def merge_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/SCD2 emulation without Delta: upsert a batch of 'updates'
    (every P-status order at 10% higher price) into the orders snapshot via
    anti-join + union — the stock-Spark CDC pattern (guide: 'MERGE INTO
    needs Delta; emulate with anti-join + union').
    """
    orders = t(spark, sf_dir, "orders")
    updates = orders.filter(F.col("o_orderstatus") == "P").select(
        "o_orderkey",
        ieee_round(F.col("o_totalprice") * 1.1, 2).alias("o_totalprice"),
        F.lit(2).alias("version"),
    )
    current = orders.select(
        "o_orderkey", "o_totalprice", F.lit(1).alias("version")
    )
    kept = current.join(updates, "o_orderkey", "left_anti")
    return kept.unionByName(updates)


MERGE_SCD2_SQL = f"""
WITH updates AS (
    SELECT o_orderkey,
           {sql_ieee_round("o_totalprice * 1.1")} AS o_totalprice,
           2 AS version
    FROM orders WHERE o_orderstatus = 'P'
)
SELECT o_orderkey, o_totalprice, 1 AS version
FROM orders o
-- NOT EXISTS, not NOT IN: a left_anti join keeps a NULL-key row (the
-- equality never matches), while NOT IN turns ANY NULL comparison into
-- "unknown" and silently drops it — the classic SQL trap, caught by
-- the degenerate-orders net's NULL-orderkey row
WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.o_orderkey = o.o_orderkey)
UNION ALL
SELECT * FROM updates
"""


def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — the 100 TB substitutes for exact distinct/
    percentile (HLL++ and KLL-ish sketches, constant memory per group).
    Sketch VALUES differ across engines, so the driver-compared output is
    the exact anchors plus within-tolerance verdicts (HLL++ rsd default
    5%; percentile_approx within 1% of the exact median) — the oracle
    computes the anchors and expects TRUE verdicts. Raw sketch-vs-exact
    error curves live in tests/test_approx.py."""
    li = t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("_ap"),
        F.percentile_approx("l_extendedprice", 0.5).alias("_am"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("_em"),
        F.count("*").alias("cnt"),
        F.min("l_extendedprice").alias("_mn"),
        F.max("l_extendedprice").alias("_mx"),
    )
    # percentile_approx's actual guarantee is an OBSERVED value at the
    # requested rank; for a tiny group the exact (interpolating) median
    # can sit far from EVERY observed value, so the 1%-of-median check is
    # the wrong invariant there — the degenerate-lineitem net pinned this
    # with a 2-row group whose middle values are 77.7 and 1000. Small
    # groups assert the real contract instead: an observed in-range value.
    # All-NULL-measure group (empty/allnull net): both engines' exact
    # percentile over zero non-NULL inputs is NULL, and the contract is
    # that the approx agrees — a NULL verdict here would diverge from
    # the oracle's literal TRUE.
    median_ok = F.when(
        F.col("_em").isNull(), F.col("_am").isNull()
    ).when(
        F.col("cnt") >= 100,
        F.abs(F.col("_am") - F.col("_em")) <= 0.01 * F.col("_em"),
    ).otherwise(
        (F.col("_am") >= F.col("_mn")) & (F.col("_am") <= F.col("_mx"))
    )
    return agg.select(
        "l_returnflag",
        "cnt",
        "n_parts",
        (F.abs(F.col("_ap") - F.col("n_parts")) <= 0.05 * F.col("n_parts")).alias(
            "approx_parts_ok"
        ),
        median_ok.alias("approx_median_ok"),
    ).orderBy("l_returnflag")


AGG_APPROX_SQL = """
SELECT l_returnflag,
       count(*) AS cnt,
       count(DISTINCT l_partkey) AS n_parts,
       TRUE AS approx_parts_ok,
       TRUE AS approx_median_ok
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def agg_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact + approximate distinct counts. The approx column is Spark
    HLL++ — engines differ, so only the exact columns are oracle-compared
    and the approx is asserted within ±5% in unit tests."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("cnt"),
    ).orderBy("l_returnflag")


AGG_DISTINCT_COUNT_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(*) AS cnt
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube): totals by status, by
    priority, and grand total — but not the cross combination.

    The () set is a separate UNION ALL branch (a global aggregate) so
    the empty-scan limit matches the SQL standard — Spark's Expand
    emits nothing on empty input, DuckDB emits the one grand-total
    row; see agg_rollup."""
    orders = t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT * FROM (
            SELECT o_orderstatus, o_orderpriority,
                   count(*) AS cnt,
                   round(sum(o_totalprice), 2) AS sum_price
            FROM _gs_orders
            GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
            UNION ALL
            SELECT CAST(NULL AS STRING), CAST(NULL AS STRING),
                   count(*), round(sum(o_totalprice), 2)
            FROM _gs_orders
        )
        ORDER BY o_orderstatus, o_orderpriority
        """
    )


AGG_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS cnt,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus, o_orderpriority
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead navigation: per-customer order-over-order price delta and
    the next order's date. Sort keys pinned NULLS LAST on both engines
    (see window_running_sum)."""
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc_nulls_last(),
        F.col("o_orderkey").asc_nulls_last(),
    )
    prev_price = F.lag("o_totalprice").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") - F.coalesce(prev_price, F.lit(0.0)), 2).alias(
            "price_delta"
        ),
        F.lead("o_orderdate").over(w).alias("next_order_date"),
    )


WINDOW_LAG_LEAD_SQL = """
SELECT o_custkey, o_orderkey,
       round(o_totalprice - COALESCE(
           lag(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate NULLS LAST, o_orderkey NULLS LAST
           ), 0.0), 2) AS price_delta,
       lead(o_orderdate) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate NULLS LAST, o_orderkey NULLS LAST
       ) AS next_order_date
FROM orders
"""


def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string surface beyond the reference's split/concat: case,
    substring, padding, replacement, trim, length, position."""
    part = t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.lpad(F.col("p_brand"), 10, "_").alias("brand_padded"),
        F.regexp_replace("p_name", "widget", "gadget").alias("name_replaced"),
        F.length(F.trim(F.col("p_type"))).cast("long").alias("type_len"),
        F.instr("p_name", "bolt").cast("long").alias("bolt_pos"),
    )


STRING_FUNCTIONS_SQL = """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       substring(p_name, 1, 4) AS name_prefix,
       lpad(p_brand, 10, '_') AS brand_padded,
       regexp_replace(p_name, 'widget', 'gadget', 'g') AS name_replaced,
       CAST(length(trim(p_type)) AS BIGINT) AS type_len,
       -- no NULL->0 coercion: Spark instr(NULL) is NULL, and so is
       -- DuckDB position() on a NULL name; both return 0 only for a
       -- genuine not-found. Caught by the degenerate-part net.
       CAST(position('bolt' IN p_name) AS BIGINT) AS bolt_pos
FROM part
"""


def array_explode_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface: split → explode → re-aggregate (token frequencies
    across the corpus — the classic text-pipeline explode shape)."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))), "\\s+")).alias("tok")
    )
    return (
        toks.groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") >= 100)
        .orderBy(F.col("freq").desc(), "tok")
    )


ARRAY_EXPLODE_SQL = """
SELECT tok, count(*) AS freq
FROM (
    SELECT unnest(string_split_regex(lower(trim(coalesce(text, ''))), '[ \\t\\n\\x0b\\f\\r]+')) AS tok
    FROM documents
)
GROUP BY tok
HAVING count(*) >= 100
ORDER BY freq DESC, tok
"""


# ---------------------------------------------------------------------------
# Text analysis / language-ID / quality (operators.text)
# ---------------------------------------------------------------------------


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language ID (operators.text.lang_id)."""
    from ..operators.text import lang_id

    docs = t(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id("text").alias("lang_guess"))


def _lang_hits_sql(lang_words: list[str]) -> str:
    arr = ", ".join(f"'{w}'" for w in lang_words)
    return (
        "len(list_intersect(list_distinct("
        "string_split_regex(lower(trim(coalesce(text, ''))), '[ \\t\\n\\x0b\\f\\r]+')), [" + arr + "]))"
    )


def _text_lang_id_sql(extra_cols: str = "") -> str:
    """``extra_cols`` threads additional document columns through the
    prediction CTE so consumers never need to JOIN back on doc_id — a
    doc_id = doc_id re-join silently drops NULL-id rows that the
    per-row Spark form keeps (caught by the degenerate-docs net)."""
    from ..operators.text import STOPWORDS

    langs = sorted(STOPWORDS)  # tie-break order must match lang_id()
    hits = {lang: _lang_hits_sql(STOPWORDS[lang]) for lang in langs}
    best = "greatest(" + ", ".join(hits[lang] for lang in langs) + ")"
    case = " ".join(
        f"WHEN {hits[lang]} = best THEN '{lang}'" for lang in langs
    )
    extra = f", {extra_cols}" if extra_cols else ""
    return f"""
SELECT doc_id{extra},
       CASE WHEN best = 0 THEN 'und' {case} ELSE 'und' END AS lang_guess
FROM (SELECT doc_id{extra}, text, {best} AS best FROM documents)
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining-style quality score (operators.text.quality_score)."""
    from ..operators.text import quality_score

    docs = t(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score("text").alias("quality"))


TEXT_QUALITY_SQL = f"""
SELECT doc_id,
       {sql_ieee_round(
           "0.4 * least(n_tok / 200.0, 1.0) "
           "+ 0.3 * (CASE WHEN n_chars > 0 THEN n_alpha / n_chars ELSE 0.0 END) "
           "+ 0.3 * (CASE WHEN n_tok > 0 THEN n_uniq / n_tok ELSE 0.0 END)",
           4,
       )} AS quality
FROM (
    SELECT doc_id,
           CAST(len(string_split_regex(lower(trim(coalesce(text, ''))), '[ \\t\\n\\x0b\\f\\r]+')) AS DOUBLE) AS n_tok,
           CAST(len(list_distinct(string_split_regex(lower(trim(coalesce(text, ''))), '[ \\t\\n\\x0b\\f\\r]+'))) AS DOUBLE) AS n_uniq,
           CAST(length(coalesce(text, '')) AS DOUBLE) AS n_chars,
           CAST(length(regexp_replace(coalesce(text, ''), '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha
    FROM documents
)
"""


def text_bpe_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting (operators.text.bpe_ish_token_count)."""
    from ..operators.text import bpe_ish_token_count

    docs = t(spark, sf_dir, "documents")
    return docs.select("doc_id", bpe_ish_token_count(F.coalesce(F.col("text"), F.lit(""))).alias("n_bpe_tokens"))


TEXT_BPE_COUNT_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(coalesce(text, ''), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0b\f\r]'))
            AS BIGINT) AS n_bpe_tokens
FROM documents
"""


# ---------------------------------------------------------------------------
# Near-dup dedup (operators.dedup) — md5-blocked variants are oracle-paired;
# the xxhash64 MinHash/SimHash paths are Spark-only (rows-only check).
# ---------------------------------------------------------------------------


def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup pairs, min-md5-shingle blocking (the k=1
    MinHash blocking key, expressible in both engines).

    The blocking key is md5-based so BOTH engines bucket identically;
    the in-bucket verify however intersects xxhash64-hashed shingle
    arrays, not the strings — intersection/union SIZES (and hence the
    Jaccard value the oracle checks) are hash-invariant, and long-array
    intersects cut the dominant in-bucket cost roughly in half.

    Hot-bucket cap: mirrors the production operator's ``max_bucket``
    (operators/dedup.py jaccard_pairs) with the identical
    ``count(*) over (partition by block) <= 1000`` filter on BOTH
    engines — whole blocks are dropped, never individual rows, so the
    two sides stay deterministic and comparable. Without it a single
    pathological shared shingle makes the block quadratic at 100 TB."""
    max_bucket = 1000
    from ..operators.dedup import shingles_from_tokens
    from ..operators.layout import spread_scan
    from ..operators.text import tokens

    # r18: the tokenize + shingle + md5/xxhash pipeline fuses into the
    # scan stage, which is ONE task on the single-row-group bench file
    # (measured 3.6s on one core) — spread the scan first (no-op on
    # healthy layouts; see operators/layout.py)
    docs = spread_scan(t(spark, sf_dir, "documents"))

    sh = (
        docs.select(
            F.col("doc_id").alias("id"),
            tokens(F.coalesce(F.col("text"), F.lit(""))).alias("_toks"),
        )
        .select(F.col("id"), shingles_from_tokens("_toks", 3).alias("sh"))
        .select(
            "id",
            # the block key MUST be non-nullable: a nullable join key makes
            # the optimizer infer isnotnull(block) and push it below the
            # projections, re-deriving the whole shingle pipeline against
            # raw text — which re-tokenizes per lambda element (measured
            # 10s vs 0.3s at sf0.1). The coalesce sentinel is also the
            # null policy: an empty doc gets a per-row unique key and can
            # never co-bucket.
            F.coalesce(
                F.array_min(F.transform(F.col("sh"), F.md5)),
                F.concat(
                    F.lit("__empty__"),
                    F.coalesce(F.col("id").cast("string"), F.lit("?")),
                ),
            ).alias("block"),
            F.transform(F.col("sh"), lambda s: F.xxhash64(s)).alias("shh"),
        )
    )
    sh = sh.withColumn(
        "_bsz", F.count(F.lit(1)).over(Window.partitionBy("block"))
    ).filter(F.col("_bsz") <= max_bucket)
    a = sh.select("block", F.col("id").alias("id_a"), F.col("shh").alias("sh_a"))
    b = sh.select("block", F.col("id").alias("id_b"), F.col("shh").alias("sh_b"))
    pairs = a.join(b, "block").filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size("sh_a").cast("double") + F.size("sh_b").cast("double") - inter
    return (
        pairs.select(
            "id_a",
            "id_b",
            ieee_round(inter / F.greatest(union, F.lit(1.0)), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.2)
        .distinct()
    )


DEDUP_JACCARD_SQL = f"""
WITH sh AS (
    SELECT doc_id AS id, shingles,
           list_aggregate(list_transform(shingles, s -> md5(s)), 'min') AS block
    FROM (
        SELECT doc_id,
               list_filter(list_distinct(list_transform(
                   range(1, greatest(len(toks) - 2, 1) + 1),
                   i -> array_to_string(toks[i:i+2], ' '))),
                   s -> s <> '') AS shingles
        FROM (SELECT doc_id,
                     string_split_regex(lower(trim(coalesce(text, ''))), '[ \\t\\n\\x0b\\f\\r]+') AS toks
              FROM documents)
    )
),
sh_capped AS (
    SELECT id, shingles, block
    FROM (SELECT sh.*, count(*) OVER (PARTITION BY block) AS bsz FROM sh)
    WHERE bsz <= 1000
)
SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       {sql_ieee_round(
           "len(list_intersect(a.shingles, b.shingles)) * 1.0 / "
           "greatest(len(a.shingles) + len(b.shingles) "
           "- len(list_intersect(a.shingles, b.shingles)), 1)",
           4,
       )} AS jaccard
FROM sh_capped a JOIN sh_capped b ON a.block = b.block AND a.id < b.id
WHERE {sql_ieee_round(
           "len(list_intersect(a.shingles, b.shingles)) * 1.0 / "
           "greatest(len(a.shingles) + len(b.shingles) "
           "- len(list_intersect(a.shingles, b.shingles)), 1)",
           4,
       )} >= 0.2
"""


# Five entries (dedup_minhash_lsh, dedup_resolve_clusters,
# check_minhash_containment, check_cluster_consistency, split_no_leakage)
# consume the same MinHash pair set / component labels. The pairs are
# cheap to re-derive but components cost 4 localCheckpoint'ed rounds, so
# both are memoized per (session, sf_dir): labels are already
# MATERIALIZED by localCheckpoint — reuse is free and bit-identical
# (verified by the determinism sweep, which double-runs every entry).
# The memo lives as an attribute ON the owning SparkSession object, not
# in a module-level dict: a fresh session can never collide with a
# garbage-collected one the way a recycled id() could (a stopped
# session's localCheckpoint'ed plans are unusable and must never be
# served to its successor), and the cache is exactly one ordinary
# reference cycle (session → memo → DataFrame → session) that the GC
# reaps with the session — no unbounded growth in long-lived processes.
# (A module-level WeakKeyDictionary cannot express this: its values hold
# their own keys alive through df.sparkSession.)
_CC_MEMO_ATTR = "_spark_capstone_cc_memo"


class _SessionMemo(dict):
    """Plain dict that supports weak references (tests observe reaping)."""

    __slots__ = ("__weakref__",)


def _minhash_components(spark: SparkSession, sf_dir: str):
    from ..operators.cc_fast import components_from_edges
    from ..operators.dedup import minhash_lsh_pairs

    per_session: _SessionMemo | None = getattr(spark, _CC_MEMO_ATTR, None)
    if per_session is None:
        per_session = _SessionMemo()
        setattr(spark, _CC_MEMO_ATTR, per_session)
    if sf_dir not in per_session:
        from ..operators.lineage import materialize

        docs = t(spark, sf_dir, "documents")
        # Materialize the pair list ONCE (r13 eval census): within one
        # cold evaluation the full LSH pipeline (shingle explode,
        # signature agg, band join, verify) otherwise re-executes ~3x —
        # twice inside the CC edge checkpoint's symmetric union and
        # once more in the consumer's own readout (5 documents scans
        # per cold run measured; 2 after). Pairs are id-pair-sized.
        pairs = materialize(minhash_lsh_pairs(docs, threshold=0.3),
                            eager=True)
        # r18: exact contraction CC (operators.cc_fast) — one
        # partition-local union-find pass over the materialized pair
        # list instead of 4 fixed (propagate + jump) rounds (each a
        # full-edge join + label self-join). Same labels: the 4-round
        # form was proven converged on this graph (union-find twins +
        # check_cluster_consistency), and cc_fast computes that
        # fixpoint directly — now guaranteed at every SF, not by
        # round-budget margin. Edges are undirected inside cc_fast, so
        # the symmetric union + distinct the propagation form needed
        # is gone too.
        comps = components_from_edges(pairs, "id_a", "id_b")
        per_session[sf_dir] = (pairs, comps)
    return per_session[sf_dir]


def _simhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized, localCheckpoint-materialized SimHash signature
    table. The band self-join in simhash_pairs evaluates its input once
    per side, and check_simhash_invariants consumes the pairs three more
    times — an unmaterialized signature plan would run the explode +
    60-sum aggregation up to six times per driver round (measured 4-5s
    each at sf0.1; ~0.8s materialized). Signatures are doc-count-sized
    (id + one long), so the checkpoint is tiny at any SF."""
    from ..operators.dedup import simhash_signatures

    per_session: _SessionMemo | None = getattr(spark, _CC_MEMO_ATTR, None)
    if per_session is None:
        per_session = _SessionMemo()
        setattr(spark, _CC_MEMO_ATTR, per_session)
    key = ("simhash_sig", sf_dir)
    if key not in per_session:
        from ..operators.lineage import materialize

        docs = t(spark, sf_dir, "documents")
        # session-memoized cut: routed through lineage.materialize
        # (r14) so a reliable-checkpoint deployment can recover the
        # memoized signatures after executor loss instead of
        # fail-stopping every later simhash consumer in the session.
        # eager=False binds on the LOCAL path only (defer to the first
        # consumer's action); the reliable path forces eager (r15 —
        # lazy reliable pays a 2x doCheckpoint recompute, see
        # lineage.materialize)
        per_session[key] = materialize(
            simhash_signatures(docs), eager=False
        )
    return per_session[key]


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash LSH near-dup pairs (operators.dedup.minhash_lsh_pairs).
    xxhash64-based → no DuckDB twin; driver records a rows-only check, and
    tests/test_dedup.py verifies recall against exact Jaccard."""
    pairs, _ = _minhash_components(spark, sf_dir)
    return pairs.orderBy("id_a", "id_b")


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash hamming near-dup candidates (operators.dedup.simhash_pairs).
    xxhash64-based → rows-only check + unit tests."""
    from ..operators.dedup import simhash_pairs

    docs = t(spark, sf_dir, "documents")
    return simhash_pairs(
        docs, max_hamming=6, sig_df=_simhash_sig(spark, sf_dir)
    ).orderBy("id_a", "id_b")


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding cosine near-dup pairs blocked on label
    (operators.dedup.embedding_dup_pairs). Threshold 0.3: the synthetic
    embeddings top out at cosine ~0.47, so the production default (0.95)
    would select nothing — the low threshold keeps the check non-trivial."""
    from ..operators.dedup import embedding_dup_pairs

    emb = t(spark, sf_dir, "embeddings")
    return embedding_dup_pairs(emb, threshold=0.3)


# Each CTE row carries the double vector AND its materialized norm (same
# op sequence as operators.dedup.norm_of: sequential-fold sum of squares,
# sqrt, 1e-6 floor), so the pairwise compare is ONE dot fold + a scalar
# division — mirroring the Spark side's layout exactly (3× cheaper per
# candidate pair than folding both norms inside the join).
_NORM_N_SQL = (
    "greatest(sqrt(list_reduce(list_transform(embedding::DOUBLE[], "
    "y -> y * y), (a, b) -> a + b)), 1e-6)"
)
_COS_SQL = (
    "list_reduce(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]), "
    "(x, y) -> x + y) / (a.n * b.n)"
)

DEDUP_EMBEDDING_SQL = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v, {_NORM_N_SQL} AS n
           FROM embeddings WHERE embedding IS NOT NULL)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {sql_ieee_round(_COS_SQL, 6)} AS cos
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {sql_ieee_round(_COS_SQL, 6)} >= 0.3
"""


# ---------------------------------------------------------------------------
# Similarity search (operators.similarity)
# ---------------------------------------------------------------------------


def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-3 for probe queries (vec_id < 5)."""
    from ..operators.similarity import cosine_topk

    emb = t(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=3)


SIMILARITY_TOPK_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, {_NORM_N_SQL} AS n
           FROM embeddings WHERE embedding IS NOT NULL),
scored AS (
    SELECT b.vec_id AS query_id, a.vec_id AS neighbor_id,
           {sql_ieee_round(_COS_SQL, 6)} AS cos
    FROM e a JOIN e b ON b.vec_id < 5 AND a.vec_id <> b.vec_id
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cos
FROM (
    SELECT query_id, neighbor_id, cos,
           row_number() OVER (
               PARTITION BY query_id ORDER BY cos DESC, neighbor_id
           ) AS rank
    FROM scored
) WHERE rank <= 3
"""


def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat approximate top-3 (operators.similarity.ivf_topk): k-means
    coarse quantizer + probed inverted lists. KMeans training is not
    bit-deterministic across environments → rows-only check; recall vs the
    exact baseline is asserted in tests."""
    from ..operators.similarity import ivf_topk

    emb = t(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 5), k=3)


def dedup_resolve_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup resolution: MinHash-LSH pairs → connected
    components → surviving doc ids (operators.clusters). Iterative
    dataflow → rows-only check; components verified against union-find in
    tests. Components come from the shared memo (same labels every
    caller)."""
    docs = t(spark, sf_dir, "documents")
    _, comps = _minhash_components(spark, sf_dir)
    losers = comps.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    return docs.select("doc_id", "lang", "source").join(
        losers, "doc_id", "left_anti"
    )


def similarity_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-3 (operators.similarity.lsh_topk).
    xxhash64 hyperplanes → rows-only check; recall measured in tests."""
    from ..operators.similarity import lsh_topk

    emb = t(spark, sf_dir, "embeddings")
    return lsh_topk(emb, emb.filter(F.col("vec_id") < 5), k=3, bits=4, probes=5)


# ---------------------------------------------------------------------------
# Driver-visible invariant checks for the rows-only (no_oracle) operators.
# The sketch/hash internals (xxhash64 MinHash, SimHash, LSH hyperplanes,
# k-means) are not DuckDB-expressible, but their CONTRACTS are: containment
# in exact results, violation counts that must be zero, and anchor counts
# DuckDB computes independently. Each check is a deterministic single-row
# (or few-row) result the driver hash-compares like any other entry.
# ---------------------------------------------------------------------------


def _scalar(df: DataFrame, expr: Column, name: str) -> DataFrame:
    """One-row aggregate helper for invariant checks."""
    return df.agg(expr.cast("long").alias(name))


def check_minhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible contract of dedup_minhash_lsh (xxhash64 → no direct
    oracle): (1) every emitted pair's INDEPENDENTLY recomputed string-
    shingle Jaccard is ≥ threshold (phase-2 verify holds), (2) every exact
    near-dup pair at Jaccard ≥ 0.95 is found (the S-curve catches J≥0.95
    w.p. 1-(1-0.95⁴)⁸ ≈ 1-2e-6 per pair; measured 0 missed), (3) output
    ordering id_a < id_b. The anchor n_high_pairs is computed by DuckDB
    from raw text — a non-vacuous, data-dependent value. The exact-pair
    anchor reuses dedup_jaccard_pairs (md5-min blocking, the oracle's own
    formulation) so both engines block identically at every SF."""
    from ..operators.dedup import shingles_from_tokens
    from ..operators.text import tokens

    docs = t(spark, sf_dir, "documents")
    lsh, _ = _minhash_components(spark, sf_dir)
    high = (
        dedup_jaccard_pairs(spark, sf_dir)
        .filter(F.col("jaccard") >= 0.95)
        .select("id_a", "id_b")
    )
    sh = (
        docs.select(
            F.col("doc_id"),
            tokens(F.coalesce(F.col("text"), F.lit(""))).alias("_toks"),
        )
        .select(F.col("doc_id"), shingles_from_tokens("_toks").alias("sh"))
        # hashed shingles: Jaccard is intersection/union-SIZE based, so
        # xxhash64 arrays give the same value at half the compare cost
        .select(
            "doc_id", F.transform(F.col("sh"), lambda s: F.xxhash64(s)).alias("sh")
        )
    )
    rejoined = lsh.join(
        sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
    ).join(sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size("sh_a").cast("double") + F.size("sh_b").cast("double") - inter
    exact_j = ieee_round(inter / F.greatest(union, F.lit(1.0)), 4)
    return (
        _scalar(high, F.count("*"), "n_high_pairs")
        .crossJoin(
            _scalar(
                high.join(lsh.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti"),
                F.count("*"),
                "n_high_missed",
            )
        )
        .crossJoin(
            _scalar(
                rejoined.filter(exact_j < 0.3), F.count("*"), "n_below_threshold"
            )
        )
        .crossJoin(
            _scalar(
                lsh.filter(F.col("id_a") >= F.col("id_b")),
                F.count("*"),
                "n_order_violations",
            )
        )
    )


def _sql_jaccard_high_count(threshold: float) -> str:
    """DuckDB count of exact blocked-Jaccard pairs ≥ threshold (same
    min-shingle blocking family as DEDUP_JACCARD_SQL)."""
    j = (
        "len(list_intersect(a.shingles, b.shingles)) * 1.0 / "
        "greatest(len(a.shingles) + len(b.shingles) "
        "- len(list_intersect(a.shingles, b.shingles)), 1)"
    )
    return f"""
SELECT count(*) FROM (
    WITH sh AS (
        SELECT doc_id AS id, shingles,
               list_aggregate(list_transform(shingles, s -> md5(s)), 'min') AS block
        FROM (
            SELECT doc_id,
                   list_filter(list_distinct(list_transform(
                       range(1, greatest(len(toks) - 2, 1) + 1),
                       i -> array_to_string(toks[i:i+2], ' '))),
                       s -> s <> '') AS shingles
            FROM (SELECT doc_id,
                         string_split_regex(lower(trim(coalesce(text, ''))), '[ \\t\\n\\x0b\\f\\r]+') AS toks
                  FROM documents)
        )
    )
    SELECT DISTINCT a.id, b.id
    FROM sh a JOIN sh b ON a.block = b.block AND a.id < b.id
    WHERE {sql_ieee_round(j, 4)} >= {threshold}
)"""


CHECK_MINHASH_SQL = f"""
SELECT CAST(({_sql_jaccard_high_count(0.95)}) AS BIGINT) AS n_high_pairs,
       CAST(0 AS BIGINT) AS n_high_missed,
       CAST(0 AS BIGINT) AS n_below_threshold,
       CAST(0 AS BIGINT) AS n_order_violations
"""


def check_simhash_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible contract of dedup_simhash: emitted pairs respect the
    hamming bound and ordering (violations = 0), and SimHash at
    max_hamming=6 recalls at least half of the exact J≥0.95 near-dups
    (measured: ~75-88% across SFs — bit-vote signatures lose some
    token-level near-dups, the documented trade vs MinHash). DuckDB anchors
    n_high_pairs from raw text; the exact-pair anchor reuses
    dedup_jaccard_pairs (md5-min blocking — the oracle's formulation)."""
    from ..operators.dedup import simhash_pairs
    from ..operators.lineage import materialize

    docs = t(spark, sf_dir, "documents")
    # Materialize both pair lists once (r13 eval census): `sim` feeds
    # three readouts and `high` two (count + anti-join), so the band
    # self-join and the full Jaccard shingle pipeline re-executed per
    # consumer — 5 documents scans per cold run measured; 3 after
    # (1 sig memo + 2 inside the high materialization). Both are
    # id-pair-sized.
    sim = materialize(
        simhash_pairs(docs, max_hamming=6, sig_df=_simhash_sig(spark, sf_dir)),
        eager=True,
    )
    high = materialize(
        dedup_jaccard_pairs(spark, sf_dir)
        .filter(F.col("jaccard") >= 0.95)
        .select("id_a", "id_b"),
        eager=True,
    )
    n_high = _scalar(high, F.count("*"), "n_high_pairs")
    n_missed = _scalar(
        high.join(sim.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti"),
        F.count("*"),
        "_missed",
    )
    return (
        n_high.crossJoin(n_missed)
        .crossJoin(
            _scalar(sim.filter(F.col("hamming") > 6), F.count("*"), "n_over_bound")
        )
        .crossJoin(
            _scalar(
                sim.filter(F.col("id_a") >= F.col("id_b")),
                F.count("*"),
                "n_order_violations",
            )
        )
        .select(
            "n_high_pairs",
            (F.col("_missed") * 2 <= F.col("n_high_pairs")).alias("high_recall_ok"),
            "n_over_bound",
            "n_order_violations",
        )
    )


CHECK_SIMHASH_SQL = f"""
SELECT CAST(({_sql_jaccard_high_count(0.95)}) AS BIGINT) AS n_high_pairs,
       TRUE AS high_recall_ok,
       CAST(0 AS BIGINT) AS n_over_bound,
       CAST(0 AS BIGINT) AS n_order_violations
"""


def _ann_check(
    spark: SparkSession,
    sf_dir: str,
    approx: DataFrame,
    k: int,
    recall_floor: int | None = None,
) -> DataFrame:
    """Shared ANN contract: complete result sets (k rows per query) and no
    approximate score ever beats the exact top-1 (approximate search only
    prunes candidates, it cannot invent similarity). With
    ``recall_floor`` (deterministic methods only — not k-means IVF), also
    require the exact top-1 neighbor to appear in the approximate top-k
    for at least that many queries.

    The exact baseline the invariants are measured against is itself
    cross-engine anchored: ``exact_top1_id_sum`` / ``exact_top1_cos_sum``
    summarize the per-query exact top-1 neighbors, and the DuckDB oracle
    recomputes BOTH by brute-force cosine SQL — so a wrong exact baseline
    (not just a violated invariant) fails the driver hash gate."""
    from ..operators.similarity import cosine_topk

    emb = t(spark, sf_dir, "embeddings")
    # n_queries must count what the ANN operators actually search:
    # NULL-vector rows are excluded by the family-wide NULL policy
    q = emb.filter((F.col("vec_id") < 5) & F.col("embedding").isNotNull())
    exact1 = cosine_topk(emb, q, k=1).select(
        "query_id", "neighbor_id", F.col("cos").alias("best_cos")
    )
    anchors = exact1.agg(
        F.sum("neighbor_id").cast("long").alias("exact_top1_id_sum"),
        # best_cos is 6dp-rounded, so round(cos*1e6) is an exact integer
        # and the anchor sum folds order-free (r12 fold discipline)
        (
            F.sum(F.round(F.col("best_cos") * 1e6, 0).cast("long")) / 1e6
        ).alias("exact_top1_cos_sum"),
    )
    joined = approx.join(exact1.select("query_id", "best_cos"), "query_id")
    n_queries = _scalar(q, F.count("*"), "n_queries")
    n_rows = _scalar(approx, F.count("*"), "_rows")
    n_beats = _scalar(
        joined.filter(F.col("cos") > F.col("best_cos")), F.count("*"), "n_beats_exact"
    )
    out = (
        n_queries.crossJoin(anchors)
        .crossJoin(n_rows)
        .crossJoin(n_beats)
        .select(
            "n_queries",
            "exact_top1_id_sum",
            "exact_top1_cos_sum",
            (F.col("_rows") == F.col("n_queries") * k).alias("rows_complete"),
            "n_beats_exact",
        )
    )
    if recall_floor is not None:
        hits = approx.join(
            exact1.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
        )
        out = out.crossJoin(_scalar(hits, F.count("*"), "_hits")).select(
            "n_queries",
            "exact_top1_id_sum",
            "exact_top1_cos_sum",
            "rows_complete",
            "n_beats_exact",
            (F.col("_hits") >= recall_floor).alias("recall_floor_ok"),
        )
    return out


def check_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible contract of similarity_lsh_topk: k results per
    query, no approximate cos above the exact optimum, and (hyperplanes
    are deterministic, so recall is a fixed number, measured 2-4 of 5
    across SFs) the exact top-1 appears in the approximate top-3 for at
    least one query. n_queries AND the exact-top-1 baseline (id/cos sums)
    are recomputed by DuckDB brute-force cosine SQL, so the floor is
    measured against a cross-engine-verified exact set."""
    from ..operators.similarity import lsh_topk

    emb = t(spark, sf_dir, "embeddings")
    approx = lsh_topk(emb, emb.filter(F.col("vec_id") < 5), k=3, bits=4, probes=5)
    return _ann_check(spark, sf_dir, approx, k=3, recall_floor=1)


def check_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible contract of similarity_ivf_topk — invariants that
    hold under k-means nondeterminism (completeness + can't-beat-exact),
    measured against a DuckDB-recomputed exact top-1 baseline."""
    from ..operators.similarity import ivf_topk

    emb = t(spark, sf_dir, "embeddings")
    approx = ivf_topk(emb, emb.filter(F.col("vec_id") < 5), k=3)
    return _ann_check(spark, sf_dir, approx, k=3)


# The oracle recomputes the exact top-1 neighbor per probe query by
# brute-force cosine (same ranking rule as similarity_topk: rounded cos
# desc, neighbor_id asc) and aggregates it into the two anchor columns —
# the invariant booleans/zeros are the expected constants, but the
# baseline they are measured against is genuinely cross-engine verified.
_ANN_EXACT_TOP1_CTE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, {_NORM_N_SQL} AS n
           FROM embeddings WHERE embedding IS NOT NULL),
scored AS (
    SELECT b.vec_id AS query_id, a.vec_id AS neighbor_id,
           {sql_ieee_round(_COS_SQL, 6)} AS cos
    FROM e a JOIN e b ON b.vec_id < 5 AND a.vec_id <> b.vec_id
),
top1 AS (
    SELECT query_id, neighbor_id, cos
    FROM (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY cos DESC, neighbor_id
               ) AS rank
        FROM scored
    ) WHERE rank = 1
)
"""

CHECK_ANN_SQL = f"""
{_ANN_EXACT_TOP1_CTE}
SELECT CAST((SELECT count(*) FROM embeddings
              WHERE vec_id < 5 AND embedding IS NOT NULL) AS BIGINT)
           AS n_queries,
       CAST(sum(neighbor_id) AS BIGINT) AS exact_top1_id_sum,
       sum(CAST(round(cos * 1000000) AS BIGINT)) / 1000000.0
           AS exact_top1_cos_sum,
       TRUE AS rows_complete,
       CAST(0 AS BIGINT) AS n_beats_exact
FROM top1
"""

CHECK_ANN_RECALL_SQL = f"""
{_ANN_EXACT_TOP1_CTE}
SELECT CAST((SELECT count(*) FROM embeddings
              WHERE vec_id < 5 AND embedding IS NOT NULL) AS BIGINT)
           AS n_queries,
       CAST(sum(neighbor_id) AS BIGINT) AS exact_top1_id_sum,
       sum(CAST(round(cos * 1000000) AS BIGINT)) / 1000000.0
           AS exact_top1_cos_sum,
       TRUE AS rows_complete,
       CAST(0 AS BIGINT) AS n_beats_exact,
       TRUE AS recall_floor_ok
FROM top1
"""


def check_cluster_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible contract of dedup_resolve_clusters: after the fixed
    4 propagation rounds every edge's endpoints share a component
    (converged), every component label is the true min doc_id of its
    members, and the doc count anchors against DuckDB."""
    docs = t(spark, sf_dir, "documents")
    pairs, comps = _minhash_components(spark, sf_dir)
    edges = pairs.select("id_a", "id_b")
    ca = comps.select(F.col("id").alias("id_a"), F.col("component").alias("comp_a"))
    cb = comps.select(F.col("id").alias("id_b"), F.col("component").alias("comp_b"))
    edge_viol = (
        edges.join(ca, "id_a").join(cb, "id_b").filter(F.col("comp_a") != F.col("comp_b"))
    )
    minlabel_viol = (
        comps.groupBy("component")
        .agg(F.min("id").alias("min_id"))
        .filter(F.col("min_id") != F.col("component"))
    )
    return (
        _scalar(docs, F.count("*"), "n_docs")
        .crossJoin(_scalar(edge_viol, F.count("*"), "n_edge_violations"))
        .crossJoin(_scalar(minlabel_viol, F.count("*"), "n_minlabel_violations"))
    )


CHECK_CLUSTERS_SQL = """
SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
       CAST(0 AS BIGINT) AS n_edge_violations,
       CAST(0 AS BIGINT) AS n_minlabel_violations
"""


# ---------------------------------------------------------------------------
# r2 surface widening: null-safe join, higher-order array functions, PII
# redaction, per-source token budgets, repetition filtering, histograms
# ---------------------------------------------------------------------------


def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``eqNullSafe`` / IS NOT DISTINCT FROM):
    NULL keys match NULL keys — the semantics a plain equi-join silently
    drops. Key nulled for one segment to make the NULL group real. The
    count side is tiny (≤ |segments|) → broadcast."""
    cust = t(spark, sf_dir, "customer")
    left = cust.select(
        "c_custkey", F.expr("nullif(c_mktsegment, 'MACHINERY')").alias("seg")
    )
    counts = (
        left.groupBy("seg")
        .agg(F.count("*").alias("seg_cnt"))
        .withColumnRenamed("seg", "_cseg")  # disambiguate the join key
    )
    joined = left.join(
        F.broadcast(counts), F.col("seg").eqNullSafe(F.col("_cseg"))
    )
    return joined.select("c_custkey", "seg", "seg_cnt").orderBy("c_custkey")


JOIN_NULL_SAFE_SQL = """
WITH l AS (SELECT c_custkey, nullif(c_mktsegment, 'MACHINERY') AS seg
           FROM customer),
c AS (SELECT seg, count(*) AS seg_cnt FROM l GROUP BY seg)
SELECT l.c_custkey, l.seg, c.seg_cnt
FROM l JOIN c ON l.seg IS NOT DISTINCT FROM c.seg
ORDER BY l.c_custkey
"""


def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column — transform/
    filter/aggregate/exists, all JVM-side codegen (the Spark idiom for
    array math without any UDF). Sequential left-fold on both engines →
    bit-identical float sums (0.0+v₁+… ≡ v₁+…)."""
    emb = t(spark, sf_dir, "embeddings")
    vd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    total = F.aggregate(vd, F.lit(0.0), lambda a, x: a + x)
    max_abs = F.array_max(F.transform(vd, lambda x: F.abs(x)))
    return emb.select(
        "vec_id",
        F.size(F.filter(vd, lambda x: x > 0)).cast("long").alias("n_pos"),
        ieee_round(total, 6).alias("sum_all"),
        ieee_round(max_abs, 6).alias("max_abs"),
        F.exists(vd, lambda x: x > 0.9).alias("has_big"),
    ).orderBy("vec_id")


ARRAY_HIGHER_ORDER_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT vec_id,
       CAST(len(list_filter(v, x -> x > 0)) AS BIGINT) AS n_pos,
       {sql_ieee_round("list_reduce(v, (a, x) -> a + x)", 6)} AS sum_all,
       {sql_ieee_round("list_aggregate(list_transform(v, x -> abs(x)), 'max')", 6)}
           AS max_abs,
       len(list_filter(v, x -> x > 0.9)) > 0 AS has_big
FROM e ORDER BY vec_id
"""


# regex snippets hoisted (backslashes are illegal inside f-string braces
# pre-3.12); both patterns parse identically under Java regex and RE2
_EMAIL_PAT = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_NUM_PAT = "\\d{3,}"


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: redact emails then long digit runs, count both.
    The testdata corpus contains neither (verified), so a deterministic
    synthetic contact line is appended to every 10th doc on BOTH engines —
    the redaction work is real, the injection is the fixture. Narrow map
    stage, zero shuffle; at 100 TB cost = the scan."""
    docs = t(spark, sf_dir, "documents")
    injected = F.when(
        F.col("doc_id") % 10 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com id "),
            (F.col("doc_id") * 7919).cast("string"),
        ),
    ).otherwise(F.col("text"))
    step1 = F.regexp_replace(injected, _EMAIL_PAT, "<EMAIL>")
    step2 = F.regexp_replace(step1, _NUM_PAT, "<NUM>")
    return docs.select(
        "doc_id",
        F.regexp_count(injected, F.lit(_EMAIL_PAT)).cast("long").alias("n_emails"),
        F.regexp_count(step1, F.lit(_NUM_PAT)).cast("long").alias("n_nums"),
        F.md5(step2).alias("redacted_md5"),
    ).orderBy("doc_id")


_PII_INJECT_SQL = (
    "CASE WHEN doc_id % 10 = 0 THEN text || ' contact user' || "
    "CAST(doc_id AS VARCHAR) || '@example.com id ' || "
    "CAST(doc_id * 7919 AS VARCHAR) ELSE text END"
)
PII_REDACT_SQL = (
    "WITH inj AS (SELECT doc_id, " + _PII_INJECT_SQL + " AS t0 FROM documents),\n"
    "s1 AS (SELECT doc_id, t0, regexp_replace(t0, '" + _EMAIL_PAT + "', '<EMAIL>', 'g') AS t1 FROM inj)\n"
    "SELECT doc_id,\n"
    "       CAST(len(regexp_extract_all(t0, '" + _EMAIL_PAT + "')) AS BIGINT) AS n_emails,\n"
    "       CAST(len(regexp_extract_all(t1, '" + _NUM_PAT + "')) AS BIGINT) AS n_nums,\n"
    "       md5(regexp_replace(t1, '" + _NUM_PAT + "', '<NUM>', 'g')) AS redacted_md5\n"
    "FROM s1 ORDER BY doc_id"
)


def source_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token budget: keep docs (in deterministic content-hash
    order) while the source's running token total stays ≤ 800 — the
    per-domain quota pattern of corpus curation. The running sum is the
    two-pass chunked layout (operators/packing.py): no per-source
    single-task window, same scale shape as pack_sequences.

    NULL policy (random-docs fuzz, r9): keyless docs are excluded on
    both engines — doc_id is the output identity AND the tiebreak of
    the (content-hash, doc_id) quota order, and with duplicate texts
    (tied hashes) a NULL id has no defined position (Spark sorts NULLs
    first ascending, DuckDB last). Same discipline as shard_balance."""
    from ..operators.packing import chunked_running_offset
    from ..operators.text import token_count

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())
    toks = docs.select(
        "source", "doc_id", token_count(F.coalesce(F.col("text"), F.lit(""))).alias("n_tok"), F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("h")
    )
    budget = 800
    cum = chunked_running_offset(toks, "source", "h", "doc_id", "n_tok", out_col="cum")
    return (
        cum.filter(F.col("cum") + F.col("n_tok") <= budget)
        .select(
            "source",
            "doc_id",
            F.col("n_tok").cast("long").alias("n_tok"),
            F.col("cum").cast("long").alias("cum_before"),
        )
        .orderBy("source", "doc_id")
    )


SOURCE_TOKEN_BUDGET_SQL = r"""
WITH toks AS (
    SELECT source, doc_id,
           len(string_split_regex(trim(coalesce(text, '')), '[ \t\n\x0b\f\r]+')) AS n_tok,
           md5(coalesce(text, '')) AS h
    FROM documents
    WHERE doc_id IS NOT NULL
), c AS (
    SELECT source, doc_id, n_tok,
           sum(n_tok) OVER (
               PARTITION BY source ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - n_tok AS cum
    FROM toks
)
SELECT source, doc_id, CAST(n_tok AS BIGINT) AS n_tok,
       CAST(cum AS BIGINT) AS cum_before
FROM c WHERE cum + n_tok <= 800
ORDER BY source, doc_id
"""


def text_dup_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-bigram fraction per doc — the repetition gate that
    complements Gopher's duplicate-WORD fraction (captures looping
    phrases, not just vocabulary reuse). Pure per-row array expressions,
    zero shuffle."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))), r"\s+").alias("toks")
    )
    starts = F.sequence(F.lit(1), F.greatest(F.size("toks") - F.lit(1), F.lit(1)))
    grams = F.transform(starts, lambda i: F.concat_ws(" ", F.slice("toks", i, 2)))
    n_grams = F.size(grams).cast("double")
    dup_frac = ieee_round(
        1.0 - F.size(F.array_distinct(grams)) / F.greatest(n_grams, F.lit(1.0)), 4
    )
    return tok.select(
        "doc_id",
        F.size(grams).cast("long").alias("n_bigrams"),
        dup_frac.alias("dup_bigram_frac"),
        (dup_frac <= 0.05).alias("keep"),
    ).orderBy("doc_id")


_DUP_BIGRAM_EXPR = (
    "1.0 - len(list_distinct(g)) * 1.0 / greatest(len(g), 1)"
)
TEXT_DUP_BIGRAMS_SQL = (
    r"""
WITH t AS (
    SELECT doc_id, string_split_regex(lower(trim(coalesce(text, ''))), '[ \t\n\x0b\f\r]+') AS toks
    FROM documents
), g AS (
    SELECT doc_id,
           list_transform(
               range(1, greatest(len(toks) - 1, 1) + 1),
               i -> array_to_string(toks[i:i+1], ' ')) AS g
    FROM t
)
SELECT doc_id, CAST(len(g) AS BIGINT) AS n_bigrams,
"""
    + f"       {sql_ieee_round(_DUP_BIGRAM_EXPR, 4)} AS dup_bigram_frac,\n"
    + f"       {sql_ieee_round(_DUP_BIGRAM_EXPR, 4)} <= 0.05 AS keep\n"
    + "FROM g ORDER BY doc_id"
)


def token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token-length histogram (width-50 buckets): the standard
    pre-training length profile. One map-side-combined agg shuffle over
    ≤ ~100 buckets."""
    from ..operators.text import token_count

    docs = t(spark, sf_dir, "documents")
    bucket = F.floor(token_count(F.coalesce(F.col("text"), F.lit(""))) / 50).cast("long")
    return (
        docs.select(bucket.alias("bucket"), token_count(F.coalesce(F.col("text"), F.lit(""))).alias("n_tok"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("total_tokens"))
        .select(
            "bucket",
            (F.col("bucket") * 50).alias("lo_tokens"),
            "n_docs",
            "total_tokens",
        )
        .orderBy("bucket")
    )


TOKEN_HISTOGRAM_SQL = r"""
WITH t AS (
    SELECT len(string_split_regex(trim(coalesce(text, '')), '[ \t\n\x0b\f\r]+')) AS n_tok FROM documents
)
SELECT CAST(floor(n_tok / 50) AS BIGINT) AS bucket,
       CAST(floor(n_tok / 50) AS BIGINT) * 50 AS lo_tokens,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens
FROM t
GROUP BY 1
ORDER BY bucket
"""


def agg_distinct_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe distinct count: phase 1 dedups (key, value) pairs —
    a hash shuffle whose parallelism is the PAIR cardinality, not the key
    cardinality — phase 2 counts per key over the deduped set. The
    expand-free plan for COUNT(DISTINCT) when one hot key holds most of
    the data; exactly equal to count(distinct) by construction."""
    li = t(spark, sf_dir, "lineitem")
    pairs = li.select("l_returnflag", "l_partkey").distinct()
    return (
        pairs.groupBy("l_returnflag")
        .agg(F.count("*").alias("n_parts"))
        .orderBy("l_returnflag")
    )


AGG_DISTINCT_TWOPHASE_SQL = """
SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame rolling aggregate: 7-day revenue per order status over
    daily totals. Money travels as DECIMAL(18,2) through BOTH sums —
    exact arithmetic is order-independent, so the sliding-frame result is
    engine-identical no matter how each engine incrementalizes the
    window (float moving-sum tricks would drift). Final cast to double
    only at the output boundary."""
    orders = t(spark, sf_dir, "orders")
    day = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1990-01-01").cast("date")
    )
    daily = (
        orders.select(
            "o_orderstatus",
            day.cast("long").alias("day"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
        )
        .groupBy("o_orderstatus", "day")
        .agg(F.sum("p").alias("rev"))
    )
    w = Window.partitionBy("o_orderstatus").orderBy("day").rangeBetween(-6, 0)
    return daily.withColumn("rev_7d", F.sum("rev").over(w)).select(
        "o_orderstatus",
        "day",
        F.col("rev").cast("double").alias("rev"),
        F.col("rev_7d").cast("double").alias("rev_7d"),
    ).orderBy("o_orderstatus", "day")


WINDOW_RANGE_FRAME_SQL = """
WITH daily AS (
    SELECT o_orderstatus,
           date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS day,
           sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
    FROM orders
    GROUP BY 1, 2
)
SELECT o_orderstatus, day,
       CAST(rev AS DOUBLE) AS rev,
       CAST(sum(rev) OVER (
           PARTITION BY o_orderstatus ORDER BY day
           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS rev_7d
FROM daily
ORDER BY o_orderstatus, day
"""


def agg_boolean_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregate surface: count_if, bool_and,
    bool_or — predicate aggregation without CASE scaffolding."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count_if(F.col("l_quantity") > 25).alias("n_heavy"),
            F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
            F.bool_or(F.col("l_discount") > 0.05).alias("any_big_discount"),
            F.count("*").alias("cnt"),
        )
        .orderBy("l_returnflag")
    )


AGG_BOOLEAN_FUNCS_SQL = """
SELECT l_returnflag,
       count(*) FILTER (WHERE l_quantity > 25) AS n_heavy,
       bool_and(l_quantity > 0) AS all_positive,
       bool_or(l_discount > 0.05) AS any_big_discount,
       count(*) AS cnt
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window in batch mode (30-min gap) — the same
    operator the streaming path uses, verified here against the lag+cumsum
    SQL formulation of gap sessions. window.end is last_event + gap by
    session_window's definition; the oracle reproduces it as max(ts) +
    INTERVAL. One shuffle on (user_id, merged window)."""
    ev = events_table(spark, sf_dir).filter(F.col("ts").isNotNull())
    sw = F.session_window("ts", "30 minutes")
    return (
        ev.groupBy("user_id", sw.alias("sw"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end_gap"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


# epoch_us comparison (not date_diff('second')): session_window merges on
# exact µs gaps, so the oracle's new-session predicate must too
EVENTS_SESSION_WINDOW_SQL = """
WITH g AS (
    SELECT event_id, ts, user_id, value,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WHERE ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
    SELECT *, sum(is_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
    ) AS session_seq
    FROM g
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end_gap,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM s
GROUP BY user_id, session_seq
ORDER BY user_id, session_start
"""


def ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary mining: top-100 word bigrams by occurrence.
    The top-k is orderBy+limit — Spark's TakeOrdered (per-partition heaps
    + driver merge of 100-row heads), NOT a global window; scale cost is
    the gram explode + one combined count shuffle. Deterministic tiebreak
    on the gram string. The token array is projected ONCE before the
    gram transform — referencing the split inside the lambda re-evaluates
    it per element (measured 10× slower)."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        F.split(F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))), r"\s+").alias("toks")
    )
    starts = F.sequence(F.lit(1), F.greatest(F.size("toks") - F.lit(1), F.lit(1)))
    grams = F.transform(starts, lambda i: F.concat_ws(" ", F.slice("toks", i, 2)))
    return (
        tok.select(F.explode(grams).alias("gram"))
        .filter(F.col("gram") != "")
        .groupBy("gram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "gram")
        .limit(100)
    )


NGRAM_COUNTS_SQL = r"""
WITH t AS (
    SELECT string_split_regex(lower(trim(coalesce(text, ''))), '[ \t\n\x0b\f\r]+') AS toks FROM documents
), g AS (
    SELECT unnest(list_transform(
        range(1, greatest(len(toks) - 1, 1) + 1),
        i -> array_to_string(toks[i:i+1], ' '))) AS gram
    FROM t
)
SELECT gram, count(*) AS n
FROM g WHERE gram <> ''
GROUP BY gram
ORDER BY n DESC, gram
LIMIT 100
"""


def clip_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-based outlier clipping (winsorization): per-lang p05/p95
    of doc length, values clamped into the band. Two passes: a tiny
    per-lang percentile agg (broadcast back) + a narrow map — the standard
    shape for stats-then-apply at scale."""
    docs = t(spark, sf_dir, "documents")
    stats = docs.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.05)").alias("p05"),
        F.expr("percentile(n_chars, 0.95)").alias("p95"),
    )
    return (
        docs.join(F.broadcast(stats), "lang")
        .select(
            "doc_id",
            "lang",
            "n_chars",
            ieee_round(
                F.least(
                    F.greatest(F.col("n_chars").cast("double"), F.col("p05")),
                    F.col("p95"),
                ),
                2,
            ).alias("clipped"),
        )
        .orderBy("doc_id")
    )


CLIP_OUTLIERS_SQL = f"""
WITH stats AS (
    SELECT lang,
           quantile_cont(n_chars, 0.05) AS p05,
           quantile_cont(n_chars, 0.95) AS p95
    FROM documents GROUP BY lang
)
SELECT doc_id, d.lang, n_chars,
       {sql_ieee_round("least(greatest(CAST(n_chars AS DOUBLE), p05), p95)", 2)}
           AS clipped
FROM documents d JOIN stats USING (lang)
ORDER BY doc_id
"""


def ansi_safe_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode-safe conversions: the engine keeps ANSI ON (a bad cast
    must not silently corrupt, and a 12-hour job must not die on one bad
    row) — ``try_cast``/``try_divide`` are the per-expression escape
    hatches. '1-URGENT'-style strings: full-string cast → NULL (both
    engines reject trailing garbage), prefix cast → digit; division by a
    NULLed denominator → NULL, never an exception or ±inf."""
    orders = t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.expr("try_cast(o_orderpriority AS INT)").alias("bad_cast"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("priority_num"),
        F.try_divide(F.col("o_totalprice"), F.lit(0)).alias("div_zero"),
        ieee_round(
            F.try_divide(
                F.col("o_totalprice"),
                F.substring("o_orderpriority", 1, 1).cast("int"),
            ),
            4,
        ).alias("per_priority"),
    ).orderBy("o_orderkey")


ANSI_SAFE_CASTS_SQL = f"""
SELECT o_orderkey,
       TRY_CAST(o_orderpriority AS INT) AS bad_cast,
       CAST(substr(o_orderpriority, 1, 1) AS INT) AS priority_num,
       CAST(NULL AS DOUBLE) AS div_zero,
       {sql_ieee_round(
           "o_totalprice / CAST(substr(o_orderpriority, 1, 1) AS INT)", 4
       )} AS per_priority
FROM orders
ORDER BY o_orderkey
"""


def check_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible contract of the multimodal stages (no media table
    in the testdata → the deterministic 64-row fixture): decode yields
    one row per payload with positive dimensions and the true payload
    byte length; the featurizer emits a 16-dim vector in [0,1) per
    media id. The fixture size is code-defined, so the oracle anchors it
    as a constant."""
    from ..operators.multimodal import decode_media, extract_features, media_fixture

    _ensure_session_conf(spark)
    media = media_fixture(spark)
    dec = decode_media(media)
    feats = extract_features(media)
    bad_dims = dec.filter(
        (F.col("width") <= 0) | (F.col("height") <= 0) | (F.col("n_frames") <= 0)
        | (F.col("payload_bytes") <= 0)
    )
    bad_feats = feats.filter(
        (F.size("feature") != 16)
        | F.exists("feature", lambda x: (x < 0) | (x >= 1))
    )
    return (
        _scalar(dec, F.count("*"), "n_media")
        .crossJoin(_scalar(bad_dims, F.count("*"), "n_bad_dims"))
        .crossJoin(_scalar(bad_feats, F.count("*"), "n_bad_features"))
    )


CHECK_MULTIMODAL_SQL = """
SELECT CAST(64 AS BIGINT) AS n_media,
       CAST(0 AS BIGINT) AS n_bad_dims,
       CAST(0 AS BIGINT) AS n_bad_features
"""


def check_png_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible contract of the FULL PNG pixel decode (round-7:
    stdlib zlib inflate + numpy defilter, operators/multimodal.py
    png_pixels): over the 24-image real-PNG fixture, (a) every image
    yields sane stats (min ≤ mean ≤ max, crc present), and (b) the
    pixel decoder's dimensions AGREE with the independent IHDR header
    walk (two disjoint code paths — a defilter/stride bug breaks the
    join). Fixture size is code-defined → constant oracle."""
    from ..operators.multimodal import decode_media, pixel_stats, png_fixture

    _ensure_session_conf(spark)
    media = png_fixture(spark)
    stats = pixel_stats(media)
    dec = decode_media(media).select(
        F.col("media_id").alias("mid"),
        F.col("width").alias("hw"),
        F.col("height").alias("hh"),
    )
    bad_stats = stats.filter(
        (F.col("min_pixel") > F.col("max_pixel"))
        | (F.col("mean_pixel") < F.col("min_pixel"))
        | (F.col("mean_pixel") > F.col("max_pixel"))
        | F.col("pixel_crc32").isNull()
        | (F.col("channels") < 1)
        | (F.col("channels") > 4)
    )
    mismatch = stats.join(
        dec,
        (F.col("media_id") == F.col("mid"))
        & ((F.col("width") != F.col("hw")) | (F.col("height") != F.col("hh"))),
        "left_semi",
    )
    return (
        _scalar(stats, F.count("*"), "n_png")
        .crossJoin(_scalar(bad_stats, F.count("*"), "n_bad_stats"))
        .crossJoin(_scalar(mismatch, F.count("*"), "n_header_pixel_mismatch"))
    )


CHECK_PNG_PIXELS_SQL = """
SELECT CAST(24 AS BIGINT) AS n_png,
       CAST(0 AS BIGINT) AS n_bad_stats,
       CAST(0 AS BIGINT) AS n_header_pixel_mismatch
"""


def check_pixel_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible contract of the CROSS-CONTAINER pixel decode
    (round-7: PNG zlib+defilter, BMP 24-bit, GIF real-LZW all decode
    the SAME pixels): over the 12-image parity fixture each image is
    encoded three ways; per media_id the three decoded crc32s and
    (w, h) must be identical — three disjoint decode paths agreeing
    bit-for-bit. Fixture size is code-defined → constant oracle."""
    from ..operators.multimodal import parity_fixture, pixel_stats

    _ensure_session_conf(spark)
    stats = pixel_stats(parity_fixture(spark))
    per_img = stats.groupBy("media_id").agg(
        F.count("*").alias("n_codecs"),
        F.countDistinct("pixel_crc32").alias("n_crc"),
        F.countDistinct("width", "height").alias("n_dims"),
    )
    bad = per_img.filter(
        (F.col("n_codecs") != 3)
        | (F.col("n_crc") != 1)
        | (F.col("n_dims") != 1)
    )
    return (
        _scalar(per_img, F.count("*"), "n_images")
        .crossJoin(_scalar(bad, F.count("*"), "n_parity_violations"))
    )


CHECK_PIXEL_PARITY_SQL = """
SELECT CAST(12 AS BIGINT) AS n_images,
       CAST(0 AS BIGINT) AS n_parity_violations
"""


def check_wav_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible contract of the FULL WAV PCM sample decode
    (round-7: stdlib wave + numpy int16, operators/multimodal.py
    sample_stats — the audio twin of the pixel checks): over the
    16-clip fixture, (a) every clip yields sane stats (min ≤ mean ≤
    max, crc present, 16-bit range), and (b) the sample decoder's
    rate/channels/frames AGREE with the independent header-walk
    decode_media path. Fixture size is code-defined → constant
    oracle."""
    from ..operators.multimodal import decode_media, sample_stats, wav_fixture

    _ensure_session_conf(spark)
    media = wav_fixture(spark)
    stats = sample_stats(media)
    # decode_media's WAV convention: width=rate, height=channels,
    # n_frames=frame count (multimodal.py _decode_wav docstring)
    dec = decode_media(media).select(
        F.col("media_id").alias("mid"),
        F.col("width").alias("h_rate"),
        F.col("height").alias("h_ch"),
        F.col("n_frames").alias("h_frames"),
    )
    bad = stats.filter(
        (F.col("min_sample") > F.col("max_sample"))
        | (F.col("mean_sample") < F.col("min_sample"))
        | (F.col("mean_sample") > F.col("max_sample"))
        | (F.col("min_sample") < -32768)
        | (F.col("max_sample") > 32767)
        | F.col("sample_crc32").isNull()
    )
    mismatch = stats.join(
        dec,
        (F.col("media_id") == F.col("mid"))
        & (
            (F.col("sample_rate") != F.col("h_rate"))
            | (F.col("n_channels") != F.col("h_ch"))
            | (F.col("n_frames") != F.col("h_frames"))
        ),
        "left_semi",
    )
    return (
        _scalar(stats, F.count("*"), "n_wav")
        .crossJoin(_scalar(bad, F.count("*"), "n_bad_stats"))
        .crossJoin(_scalar(mismatch, F.count("*"), "n_header_sample_mismatch"))
    )


CHECK_WAV_SAMPLES_SQL = """
SELECT CAST(16 AS BIGINT) AS n_wav,
       CAST(0 AS BIGINT) AS n_bad_stats,
       CAST(0 AS BIGINT) AS n_header_sample_mismatch
"""


def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy quality gate (the cheap perplexity proxy):
    Shannon entropy of the per-doc character distribution — gibberish and
    boilerplate sit at the distribution tails. Shape at scale: char
    explode (flatMap) → per-(doc, char) counts with map-side combine →
    per-doc entropy agg; ~alphabet-size rows per doc after the first
    combine."""
    docs = t(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), "")).alias("c")
    ).filter(F.col("c") != "")
    counts = chars.groupBy("doc_id", "c").agg(F.count("*").alias("n"))
    totals = counts.groupBy("doc_id").agg(F.sum("n").alias("len"))
    p = F.col("n") / F.col("len")
    ent = counts.join(totals, "doc_id").groupBy("doc_id").agg(
        (-F.sum(p * F.log2(p))).alias("_h"),
        F.max("len").alias("n_chars_counted"),
    )
    return ent.select(
        "doc_id",
        F.col("n_chars_counted").cast("long").alias("n_chars_counted"),
        ieee_round(F.col("_h"), 4).alias("entropy"),
        (F.col("_h") >= 3.0).alias("keep"),
    ).orderBy("doc_id")


TEXT_CHAR_ENTROPY_SQL = """
WITH chars AS (
    SELECT doc_id, unnest(string_split(lower(text), '')) AS c FROM documents
), f AS (
    SELECT doc_id, c, count(*) AS n FROM chars WHERE c <> '' GROUP BY doc_id, c
), t AS (
    SELECT doc_id, sum(n) AS len FROM f GROUP BY doc_id
), e AS (
    SELECT f.doc_id,
           -sum((n * 1.0 / len) * log2(n * 1.0 / len)) AS h,
           max(len) AS n_chars_counted
    FROM f JOIN t ON f.doc_id = t.doc_id
    GROUP BY f.doc_id
)
SELECT doc_id, CAST(n_chars_counted AS BIGINT) AS n_chars_counted,
       floor(h * 10000 + 0.5) / 10000 AS entropy,
       h >= 3.0 AS keep
FROM e
ORDER BY doc_id
"""


def union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: ``unionByName(allowMissingColumns=True)``
    merges an old extract (no priority column) with a new extract (added
    column) — position-based UNION would silently misalign; by-name fills
    the missing column with NULL. The batch-append pattern every evolving
    warehouse needs."""
    orders = t(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus"
    )
    new = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    return (
        old.unionByName(new, allowMissingColumns=True)
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        .orderBy("o_orderkey")
    )


UNION_SCHEMA_EVOLUTION_SQL = """
SELECT o_orderkey, o_orderstatus, o_orderpriority
FROM (
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL BY NAME
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 1
)
ORDER BY o_orderkey
"""


def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal explode (posexplode): token position survives the
    flatten — the structure chunking/windowing operators depend on.
    DuckDB has no WITH ORDINALITY; the oracle zips positions in via
    list_transform(range(...)) before unnesting."""
    docs = t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))), r"\s+")
    return (
        docs.filter(F.col("doc_id") < 50)
        .select("doc_id", F.posexplode(toks).alias("pos", "token"))
        .filter(F.col("token") != "")
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "token")
        .orderBy("doc_id", "pos")
    )


POSEXPLODE_TOKENS_SQL = r"""
WITH t AS (
    SELECT doc_id, string_split_regex(lower(trim(coalesce(text, ''))), '[ \t\n\x0b\f\r]+') AS toks
    FROM documents WHERE doc_id < 50
), z AS (
    SELECT doc_id,
           unnest(list_transform(
               range(1, len(toks) + 1),
               i -> {'pos': i - 1, 'token': toks[i]})) AS e
    FROM t
)
SELECT doc_id, CAST(e.pos AS BIGINT) AS pos, e.token AS token
FROM z WHERE e.token <> ''
ORDER BY doc_id, pos
"""


def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string-similarity join (entity resolution): near-matching
    part names by Levenshtein ≤ 3. The scale shape: (1) collapse to the
    DISTINCT value domain first — edit distance runs on unique strings,
    never on row duplicates; (2) block on the first token so the
    quadratic stays inside blocks (same family as every dedup operator
    here); (3) JVM-side ``levenshtein`` — no UDF."""
    part = t(spark, sf_dir, "part")
    names = part.select(F.col("p_name").alias("s")).distinct().withColumn(
        "blk", F.split(F.col("s"), " ").getItem(0)
    )
    a = names.select("blk", F.col("s").alias("name_a"))
    b = names.select("blk", F.col("s").alias("name_b"))
    return (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 3)
        .select("name_a", "name_b", F.col("dist").cast("long").alias("dist"))
        .orderBy("name_a", "name_b")
    )


FUZZY_NAME_PAIRS_SQL = """
WITH names AS (
    SELECT DISTINCT p_name AS s FROM part
), b AS (
    SELECT s, string_split(s, ' ')[1] AS blk FROM names
)
SELECT a.s AS name_a, c.s AS name_b,
       CAST(levenshtein(a.s, c.s) AS BIGINT) AS dist
FROM b a JOIN b c ON a.blk = c.blk AND a.s < c.s
WHERE levenshtein(a.s, c.s) <= 3
ORDER BY name_a, name_b
"""


def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot merge (SCD1 / apply-changes): base table + an ordered
    change feed (I/U/D with version) → new snapshot, last-write-wins per
    key. One window over (key ORDER BY version DESC) on base∪changes,
    keep rank 1, drop tombstones — the standard lakehouse upsert without
    any table-format dependency. The change feed is derived
    deterministically from orders (updates reprice 'P' rows, deletes
    remove keys divisible by 97, inserts append shifted keys) so both
    engines construct the identical feed."""
    orders = t(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        F.lit(0).alias("version"),
        F.lit("I").alias("op"),
    )
    updates = (
        orders.filter(F.col("o_orderstatus") == "P")
        .select(
            "o_orderkey",
            # ieee_round before the decimal cast: both engines land on the
            # same 2dp double, so the decimal conversion can't tie-split
            ieee_round(F.col("o_totalprice") * 1.1, 2)
            .cast("decimal(18,2)")
            .alias("price"),
            F.lit(1).alias("version"),
            F.lit("U").alias("op"),
        )
    )
    deletes = (
        orders.filter(F.col("o_orderkey") % 97 == 0)
        .select(
            "o_orderkey",
            F.lit(None).cast("decimal(18,2)").alias("price"),
            F.lit(2).alias("version"),
            F.lit("D").alias("op"),
        )
    )
    inserts = (
        orders.filter(F.col("o_orderkey") % 89 == 0)
        .select(
            (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
            F.lit(3).alias("version"),
            F.lit("I").alias("op"),
        )
    )
    feed = base.unionByName(updates).unionByName(deletes).unionByName(inserts)
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("version"))
    return (
        feed.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("op") != "D"))
        .select(
            "o_orderkey",
            F.col("price").cast("double").alias("price"),
            F.col("version").cast("long").alias("version"),
        )
        .orderBy("o_orderkey")
    )


CDC_APPLY_CHANGES_SQL = """
WITH feed AS (
    SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price,
           0 AS version, 'I' AS op
    FROM orders
    UNION ALL
    SELECT o_orderkey,
           CAST(floor((o_totalprice * 1.1) * 100.0 + 0.5) / 100.0
                AS DECIMAL(18,2)),
           1, 'U'
    FROM orders WHERE o_orderstatus = 'P'
    UNION ALL
    SELECT o_orderkey, CAST(NULL AS DECIMAL(18,2)), 2, 'D'
    FROM orders WHERE o_orderkey % 97 = 0
    UNION ALL
    SELECT o_orderkey + 10000000, CAST(o_totalprice AS DECIMAL(18,2)),
           3, 'I'
    FROM orders WHERE o_orderkey % 89 = 0
), ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY o_orderkey ORDER BY version DESC
    ) AS rn
    FROM feed
)
SELECT o_orderkey, CAST(price AS DOUBLE) AS price,
       CAST(version AS BIGINT) AS version
FROM ranked WHERE rn = 1 AND op <> 'D'
ORDER BY o_orderkey
"""


def _split_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, rep, split) for the leakage-safe split — shared by the
    catalog entry and test_clusters' distribution assertions."""
    docs = t(spark, sf_dir, "documents")
    _, comps = _minhash_components(spark, sf_dir)
    # comps has one row per document appearing in any near-dup pair —
    # on a real pre-dedup crawl that is 30-50% of the corpus, i.e. O(N)
    # documents-derived, so it must NOT carry a broadcast hint (r13
    # de-hint); a shuffle left join on doc_id is the correct 100 TB plan
    # and AQE still broadcasts at test scale.
    with_rep = docs.join(
        comps.select(F.col("id").alias("doc_id"), "component"),
        "doc_id",
        "left",
    ).withColumn("rep", F.coalesce(F.col("component"), F.col("doc_id")))
    # the split key is the REPRESENTATIVE's id hashed — constant per cluster
    bucket = (
        F.conv(F.substring(F.md5(F.col("rep").cast("string")), 1, 15), 16, 10)
        .cast("long") % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return with_rep.select("doc_id", "rep", split.alias("split"))


def split_no_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: near-dup CLUSTERS are assigned
    as units (split keyed on md5 of the component REPRESENTATIVE's id,
    not the member's own content), so a test doc can never have a
    near-duplicate in train — the decontamination property a naive
    per-doc split silently loses. Driver-checked invariants: no component spans two splits
    (n_leaky_clusters = 0 — structural: the split key is constant within
    a component), per-split doc counts anchor the distribution, and
    3-way coverage holds wherever the corpus is big enough for the
    claim to be data-dependent rather than luck (n_coverage_violations:
    1 iff n_docs ≥ 200 and fewer than 3 split labels appear — the
    check_* pin-zero convention, advisor r10: the previous
    all_docs_assigned boolean was structurally tautological because the
    split CASE has an otherwise branch; coverage at 6-doc degenerate /
    150-doc fuzz scale stays a local-pytest concern in
    tests/test_clusters.py). Composition:
    MinHash-LSH pairs → connected components → un-hinted rep join
    (the component map is documents-derived O(corpus); AQE may
    broadcast where it fits — r13 de-hint) → content-addressed
    bucket split."""
    assigned = _split_assignments(spark, sf_dir)
    leaky = (
        assigned.groupBy("rep")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
    )
    # cluster sizes are minhash-derived (not DuckDB-expressible), so the
    # hash-compared output is the invariant triple; per-split sizes are
    # asserted in tests/test_clusters.py
    cov = assigned.agg(
        F.when(
            (F.count("*") >= 200) & (F.countDistinct("split") < 3), F.lit(1)
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_coverage_violations")
    )
    return (
        _scalar(assigned, F.count("*"), "n_docs")
        .crossJoin(_scalar(leaky, F.count("*"), "n_leaky_clusters"))
        .crossJoin(cov)
    )


SPLIT_NO_LEAKAGE_SQL = """
SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
       CAST(0 AS BIGINT) AS n_leaky_clusters,
       CAST(0 AS BIGINT) AS n_coverage_violations
"""


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 terms by smoothed TF-IDF — the classic vocabulary
    weighting, entirely in built-ins. Shuffles: term counts per doc (hash
    agg), document frequency over distinct (doc, term) pairs, one
    term-keyed join of the two (both sides term-bucketed — at 100 TB hash
    the term to 8 bytes first), and a per-doc ranking window (doc_id is
    the high-cardinality key — full parallelism). Corpus size N broadcasts
    as a 1-row cross join. Ties break on the term string."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("n"))
    doc_len = toks.groupBy("doc_id").agg(F.count("*").alias("len"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_corpus"))
    scored = (
        tf.join(doc_len, "doc_id")
        .join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            (F.col("n") / F.col("len"))
            * F.log((F.col("n_corpus") + 1) / (F.col("df") + 1)),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "doc_id",
            F.col("rank").cast("long").alias("rank"),
            "term",
            ieee_round(F.col("tfidf"), 6).alias("tfidf"),
        )
        .orderBy("doc_id", "rank")
    )


TFIDF_TOP_TERMS_SQL = (
    r"""
WITH toks AS (
    SELECT doc_id, unnest(string_split_regex(lower(trim(coalesce(text, ''))), '[ \t\n\x0b\f\r]+')) AS term
    FROM documents
), tok AS (
    SELECT * FROM toks WHERE term <> ''
), tf AS (
    SELECT doc_id, term, count(*) AS n FROM tok GROUP BY doc_id, term
), dl AS (
    SELECT doc_id, count(*) AS len FROM tok GROUP BY doc_id
), df AS (
    SELECT term, count(*) AS df FROM tf GROUP BY term
), nd AS (
    SELECT count(*) AS n_corpus FROM documents
), scored AS (
    SELECT tf.doc_id, tf.term,
           (tf.n * 1.0 / dl.len) * ln((nd.n_corpus + 1) * 1.0 / (df.df + 1))
               AS tfidf
    FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN nd
), ranked AS (
    SELECT doc_id, term, tfidf,
           row_number() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term
           ) AS rank
    FROM scored
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, term,
"""
    + f"       {sql_ieee_round('tfidf', 6)} AS tfidf\n"
    + "FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank"
)


# ---------------------------------------------------------------------------
# Multimodal (no media table in the driver testdata → deterministic fixture
# built in-memory; rows-only checks, full pytest coverage in
# tests/test_multimodal.py)
# ---------------------------------------------------------------------------


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media columns through the mapInPandas decode stage
    (operators.multimodal; stub codec, real schema/batch plumbing)."""
    from ..operators.multimodal import decode_media, media_fixture

    _ensure_session_conf(spark)
    return decode_media(media_fixture(spark)).orderBy("media_id")


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload → deterministic feature vectors (mapInPandas featurizer);
    vectors reduced to scalars so the rows-only check sees stable values."""
    from ..operators.multimodal import extract_features, media_fixture

    _ensure_session_conf(spark)
    feats = extract_features(media_fixture(spark))
    return feats.select(
        "media_id",
        F.size("feature").cast("long").alias("dim"),
        ieee_round(
            F.aggregate(
                F.transform("feature", lambda x: x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("feature_sum"),
    ).orderBy("media_id")


# ---------------------------------------------------------------------------
# SQL-surface breadth: subqueries, HAVING, INTERSECT, window variety,
# date/regexp scalar functions, statistical + conditional aggregates.
# These round out the declarative surface a warehouse user expects beyond
# the reference's literal operator list (SURVEY.md §2.6/§2.7 "not present"
# rows, made present). Scale notes inline per entry.
# ---------------------------------------------------------------------------


def subquery_scalar_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders priced above the global average, counted per
    status. Spark form: 1-row aggregate cross-joined (broadcast — a 1-row
    build side, free at any scale; no per-row recompute). Threshold floored
    to an integer so a last-ulp avg difference between engines can't flip
    rows at the boundary."""
    orders = t(spark, sf_dir, "orders")
    thresh = orders.agg(F.floor(F.avg("o_totalprice")).alias("_thresh"))
    return (
        orders.crossJoin(F.broadcast(thresh))
        .filter(F.col("o_totalprice") > F.col("_thresh"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_above"))
        .orderBy("o_orderstatus")
    )


SUBQUERY_SCALAR_SQL = """
SELECT o_orderstatus, count(*) AS n_above
FROM orders
WHERE o_totalprice > (SELECT floor(avg(o_totalprice)) FROM orders)
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def subquery_correlated_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated subquery (customers richer than their nation's average),
    decorrelated the way Catalyst/DuckDB both do it: per-group aggregate +
    equi-join. The nation-level aggregate is 25 rows → broadcast; the only
    shuffle is the final small groupBy. Floored threshold for float safety."""
    customer = t(spark, sf_dir, "customer")
    nation_avg = customer.groupBy("c_nationkey").agg(
        F.floor(F.avg("c_acctbal")).alias("_avg_bal")
    )
    return (
        customer.join(F.broadcast(nation_avg), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_rich"))
        .orderBy("c_nationkey")
    )


SUBQUERY_CORRELATED_SQL = """
SELECT c_nationkey, count(*) AS n_rich
FROM customer c
WHERE c_acctbal > (
    SELECT floor(avg(c2.c_acctbal)) FROM customer c2
    WHERE c2.c_nationkey = c.c_nationkey
)
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY … HAVING: customers with ≥5 orders. One hash-agg shuffle on
    o_custkey; HAVING is a post-aggregate filter (Catalyst pushes nothing —
    it can't — but the aggregate is partial/final so the shuffle carries
    only (custkey, partial count))."""
    orders = t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 5)
        .orderBy("o_custkey")
    )


AGG_HAVING_SQL = """
SELECT o_custkey, count(*) AS n_orders
FROM orders
GROUP BY o_custkey
HAVING count(*) >= 5
ORDER BY o_custkey
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): customers with both a fulfilled and
    an open order. Spark `intersect` plans as a left-semi join over two
    distincts — both sides shuffle on the same key, no extra exchange."""
    orders = t(spark, sf_dir, "orders")
    f_cust = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_cust = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f_cust.intersect(o_cust).orderBy("o_custkey")


SET_INTERSECT_SQL = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
ORDER BY o_custkey
"""


def window_ntile_pctrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window variety: ntile/percent_rank/cume_dist over account
    balance within nation. Unique (acctbal, custkey) ordering makes every
    rank deterministic. One shuffle on c_nationkey; 25 balanced partitions —
    at 100 TB the per-nation partition is what AQE would split, but ranking
    windows need whole-partition order, so the honest scale path for a
    skewed partition key is the two-phase top-k in operators/topk.py.

    NULL policy (random-dims fuzz, r9): keyless customers are excluded
    on both engines — c_custkey is the output identity AND the rank
    tiebreak, and within a tied-balance block a NULL key has no
    defined position (Spark NULLS FIRST asc vs DuckDB NULLS LAST),
    which shifts every pct_rank/cume below it. NULL balances stay: the
    DESC order puts them last on both engines and the non-NULL key
    tiebreak is then total."""
    customer = t(spark, sf_dir, "customer").filter(
        F.col("c_custkey").isNotNull()
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return customer.select(
        "c_nationkey",
        "c_custkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        ieee_round(F.percent_rank().over(w), 6).alias("pct_rank"),
        ieee_round(F.cume_dist().over(w), 6).alias("cume"),
    ).orderBy("c_nationkey", "c_custkey")


WINDOW_NTILE_SQL = f"""
SELECT c_nationkey, c_custkey,
       CAST(ntile(4)      OVER w AS BIGINT) AS quartile,
       {sql_ieee_round("percent_rank() OVER w", 6)} AS pct_rank,
       {sql_ieee_round("cume_dist()    OVER w", 6)} AS cume
FROM customer
WHERE c_custkey IS NOT NULL
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
ORDER BY c_nationkey, c_custkey
"""


def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding ROWS frame: 4-order moving average of totalprice per customer
    in (date, key) order. Per-row ieee_round(…,2) before the frame sum keeps
    the true sum on the 2dp grid; a ≤4-term sum has no reassociation risk, so
    round(…,4) is tie-safe. Shuffles once on o_custkey."""
    orders = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(
            F.col("o_orderdate").asc_nulls_last(),
            F.col("o_orderkey").asc_nulls_last(),
        )
        .rowsBetween(-3, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg(ieee_round(F.col("o_totalprice"), 2)).over(w), 4).alias(
            "moving_avg"
        ),
    ).orderBy("o_custkey", "o_orderkey")


WINDOW_MOVING_AVG_SQL = f"""
SELECT o_custkey, o_orderkey,
       round(avg({sql_ieee_round("o_totalprice")}) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate NULLS LAST, o_orderkey NULLS LAST
           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
       ), 4) AS moving_avg
FROM orders
ORDER BY o_custkey, o_orderkey
"""


def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date scalar surface: datediff from an epoch, month truncation,
    quarter extraction. Pure narrow projection — pushes the column prune to
    the parquet scan, zero shuffles (the orderBy exists only for the
    deterministic sample)."""
    orders = t(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
            .cast("long")
            .alias("days_since_95"),
            # DATE on both sides: DuckDB's month-precision date_trunc returns
            # DATE while Spark's returns TIMESTAMP
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias(
                "month_start"
            ),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
        )
        .orderBy("o_orderkey")
    )


DATE_ARITHMETIC_SQL = """
SELECT o_orderkey,
       date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       CAST(extract(quarter FROM o_orderdate) AS BIGINT) AS qtr
FROM orders
ORDER BY o_orderkey
"""


def string_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp + edit-distance scalar surface on part. Narrow projection;
    regexp runs JVM-side inside codegen (no Python). DuckDB regexp_replace
    needs the 'g' flag to match Spark's replace-all semantics."""
    part = t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract(F.col("p_name"), r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace(F.col("p_type"), r"[aeiou]", "").alias("type_novowels"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#00"))
        .cast("long")
        .alias("brand_dist"),
    ).orderBy("p_partkey")


STRING_REGEXP_SQL = r"""
SELECT p_partkey,
       regexp_extract(p_name, '^(\w+)', 1) AS first_word,
       regexp_replace(p_type, '[aeiou]', '', 'g') AS type_novowels,
       CAST(levenshtein(p_brand, 'Brand#00') AS BIGINT) AS brand_dist
FROM part
ORDER BY p_partkey
"""


def agg_stats_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per returnflag. Rounding scales are chosen per
    magnitude so cross-engine co-moment merge-order noise (~1e-9 relative)
    stays far inside the tie margin: stddev/var/corr at 6dp (values ≤ ~2e2),
    covar at 0dp (values ~1e4). Single partial+final hash-agg shuffle on a
    3-value key."""
    li = t(spark, sf_dir, "lineitem")
    # corr as try_divide(covar, sx*sy), NOT native corr: Spark's ANSI
    # corr THROWS DIVIDE_BY_ZERO on a zero-variance group (all-duplicate
    # degenerate corpus) during the aggregate's own output projection —
    # no post-agg when() can guard it — while DuckDB's corr yields NULL.
    # Same co-moment inputs, so clean-data values agree to the last ulp
    # band the 6dp rounding already absorbs; the oracle mirrors the
    # formula with NULLIF(denominator, 0) so its zero-variance verdict is
    # NULL on ANY duckdb version (>=1.1 defaults ieee_floating_point_ops
    # =true, where a bare 0.0/0.0 would be NaN, not NULL — advisor r10).
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
            F.round(F.var_samp("l_quantity"), 6).alias("qty_var"),
            F.round(
                F.try_divide(
                    F.covar_samp("l_quantity", "l_extendedprice"),
                    F.stddev_samp("l_quantity")
                    * F.stddev_samp("l_extendedprice"),
                ),
                6,
            ).alias("qty_price_corr"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 0).alias(
                "qty_price_covar"
            ),
        )
        .orderBy("l_returnflag")
    )


AGG_STATS_FUNCS_SQL = """
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 6) AS qty_stddev,
       round(var_samp(l_quantity), 6) AS qty_var,
       round(covar_samp(l_quantity, l_extendedprice)
             / nullif(stddev_samp(l_quantity) * stddev_samp(l_extendedprice),
                      0),
             6) AS qty_price_corr,
       round(covar_samp(l_quantity, l_extendedprice), 0) AS qty_price_covar
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (count/sum over CASE): fulfilled-order count
    and open-order revenue per priority. Per-row ieee_round before the sum =
    the revenue parity pattern (true sum sits on the 2dp grid, final round
    is tie-safe). One shuffle on a 5-value key; partial aggregation does the
    heavy lifting map-side."""
    orders = t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_fulfilled"),
            F.round(
                F.sum(
                    F.when(
                        F.col("o_orderstatus") == "O",
                        ieee_round(F.col("o_totalprice"), 2),
                    ).otherwise(F.lit(0.0))
                ),
                2,
            ).alias("open_revenue"),
        )
        .orderBy("o_orderpriority")
    )


AGG_CONDITIONAL_SQL = f"""
SELECT o_orderpriority,
       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_fulfilled,
       round(sum(CASE WHEN o_orderstatus = 'O'
                      THEN {sql_ieee_round("o_totalprice")}
                      ELSE 0.0 END), 2) AS open_revenue
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split assignment — the reproducibility
    primitive of a training-data pipeline. Bucket = first 60 bits of
    md5(content) mod 100, so the assignment is content-addressed: stable
    across reruns, cluster sizes, and row order (unlike rand() or
    monotonically_increasing_id). Map-only narrow plan; the tiny groupBy
    is the only shuffle."""
    docs = t(spark, sf_dir, "documents")
    # NULL text content-addresses as '' (engine-wide NULL policy): the
    # DuckDB twin's concat('0x', md5(NULL)) otherwise degenerates to the
    # unparseable literal '0x' while Spark's NULL bucket falls through to
    # 'test' — a crash on one side, a silent split on the other.
    bucket = (
        F.conv(
            F.substring(F.md5(F.coalesce(F.col("text"), F.lit(""))), 1, 15),
            16,
            10,
        ).cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("split")
    )


SPLIT_ASSIGN_SQL = """
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM (
    SELECT CAST(concat('0x', substring(md5(coalesce(text, '')), 1, 15))
                AS BIGINT) % 100 AS bucket,
           n_chars
    FROM documents
)
GROUP BY 1
ORDER BY split
"""


def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (nulls / distincts / min / max per column) — the
    data-quality sweep run before any training job. One wide aggregate row
    computed in a single pass (partial aggs map-side), then pivoted long
    with stack(); no per-column jobs, no driver loop."""
    orders = t(spark, sf_dir, "orders")
    wide = orders.agg(
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("nn_custkey"),
        F.countDistinct("o_custkey").alias("nd_custkey"),
        F.min("o_custkey").cast("double").alias("mn_custkey"),
        F.max("o_custkey").cast("double").alias("mx_custkey"),
        F.count(F.when(F.col("o_totalprice").isNull(), 1)).alias("nn_price"),
        F.countDistinct("o_totalprice").alias("nd_price"),
        ieee_round(F.min("o_totalprice"), 2).alias("mn_price"),
        ieee_round(F.max("o_totalprice"), 2).alias("mx_price"),
        F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias("nn_okey"),
        F.countDistinct("o_orderkey").alias("nd_okey"),
        F.min("o_orderkey").cast("double").alias("mn_okey"),
        F.max("o_orderkey").cast("double").alias("mx_okey"),
    )
    return wide.select(
        F.expr(
            "stack(3, "
            "'o_custkey',    nn_custkey, nd_custkey, mn_custkey, mx_custkey, "
            "'o_totalprice', nn_price,   nd_price,   mn_price,   mx_price, "
            "'o_orderkey',   nn_okey,    nd_okey,    mn_okey,    mx_okey) "
            "AS (col_name, n_nulls, n_distinct, min_val, max_val)"
        )
    ).orderBy("col_name")


PROFILE_COLUMNS_SQL = f"""
SELECT 'o_custkey' AS col_name,
       count(CASE WHEN o_custkey IS NULL THEN 1 END) AS n_nulls,
       count(DISTINCT o_custkey) AS n_distinct,
       CAST(min(o_custkey) AS DOUBLE) AS min_val,
       CAST(max(o_custkey) AS DOUBLE) AS max_val
FROM orders
UNION ALL
SELECT 'o_totalprice',
       count(CASE WHEN o_totalprice IS NULL THEN 1 END),
       count(DISTINCT o_totalprice),
       {sql_ieee_round("min(o_totalprice)")},
       {sql_ieee_round("max(o_totalprice)")}
FROM orders
UNION ALL
SELECT 'o_orderkey',
       count(CASE WHEN o_orderkey IS NULL THEN 1 END),
       count(DISTINCT o_orderkey),
       CAST(min(o_orderkey) AS DOUBLE),
       CAST(max(o_orderkey) AS DOUBLE)
FROM orders
ORDER BY col_name
"""


def gapfill_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: daily event counts with missing days emitted as
    zero. Both post-agg sides are ≤ a-few-thousand rows at any data scale
    (one per day); Spark broadcasts the counts side (a left-outer BHJ must
    build right), so the only real shuffle is the groupBy on day. This is
    the resample/asfreq primitive for regularizing event streams."""
    ev = events_table(spark, sf_dir)
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    days = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day")
    )
    counts = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n")
    )
    return (
        F.broadcast(days)
        .join(counts, "day", "left")
        .select("day", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"))
        .orderBy("day")
    )


GAPFILL_SQL = """
WITH b AS (SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi
           FROM events),
days AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
                    AS day
         FROM b),
cnt AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
        FROM events GROUP BY 1)
SELECT day, CAST(COALESCE(n, 0) AS BIGINT) AS n_events
FROM days LEFT JOIN cnt USING (day)
ORDER BY day
"""


def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers whose single order exceeds a quantity
    threshold (IN-subquery over a HAVING aggregate, joined back to the fact
    and dim). The qualifying-keys set is selective but still a constant
    FRACTION of an SF-scaling fact — so the semi-join carries no forced
    broadcast hint; AQE plans it broadcast at scales where the key set
    fits and shuffled where it doesn't. lineitem aggregates once on
    l_orderkey (partial map-side sum first)."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"], "left_semi")
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            ieee_round(F.col("o_totalprice"), 2).alias("o_totalprice"),
        )
        .orderBy("o_orderkey")
    )


LARGE_ORDER_SQL = f"""
SELECT c_name, o_orderkey, {sql_ieee_round("o_totalprice")} AS o_totalprice
FROM orders
JOIN customer ON o_custkey = c_custkey
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING sum(l_quantity) > 150
)
ORDER BY o_orderkey
"""


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: up to 10 documents per (lang,
    source) stratum, chosen by content hash — reproducible across runs and
    cluster layouts, unlike TABLESAMPLE/rand(). One shuffle on the stratum
    key; at scale a skewed stratum routes through the two-phase top-k
    (operators/topk.py) instead of a single whole-partition window.

    NULL policy (random-docs fuzz, r9): keyless docs are excluded on
    both engines — a sample row without its doc_id is unretrievable,
    and with duplicate texts (tied content hashes) a NULL id has no
    defined position in the tiebreak order (Spark NULLS FIRST asc,
    DuckDB NULLS LAST). Same discipline as shard_balance."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())
    w = Window.partitionBy("lang", "source").orderBy(F.md5(F.coalesce(F.col("text"), F.lit(""))), "doc_id")
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("lang", "source", "doc_id", F.col("rk").cast("long").alias("rk"))
        .orderBy("lang", "source", "rk")
    )


SAMPLE_STRATIFIED_SQL = """
SELECT lang, source, doc_id, CAST(rk AS BIGINT) AS rk
FROM (
    SELECT lang, source, doc_id,
           row_number() OVER (
               PARTITION BY lang, source ORDER BY md5(coalesce(text, '')), doc_id
           ) AS rk
    FROM documents
    WHERE doc_id IS NOT NULL
)
WHERE rk <= 10
ORDER BY lang, source, rk
"""


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-training sequence packing (concat-then-chunk): per language,
    order docs deterministically (content hash), running token offset,
    pack_id = offset div capacity. The running sum is the two-pass chunked
    layout (operators/packing.py): md5-prefix chunks give 256 contiguous
    slices of each language's order, pass 1 turns tiny per-(lang,chunk)
    sums into broadcast chunk offsets, pass 2 windows over (lang, chunk) —
    no whole-lang single-task window, bit-identical to the one-window
    plan.

    NULL policy (random-docs fuzz, r9): keyless docs are excluded on
    both engines — doc_id breaks ties in the (content-hash, doc_id)
    packing order, and with duplicate texts a NULL id has no defined
    position (Spark NULLS FIRST asc vs DuckDB NULLS LAST), which can
    shift a pack boundary. Same discipline as shard_balance; fixed as
    a latent twin of source_token_budget (shared running-sum helper)."""
    from ..operators.packing import chunked_running_offset
    from ..operators.text import token_count

    cap = 256
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())
    toks = docs.select(
        "lang", "doc_id", token_count(F.coalesce(F.col("text"), F.lit(""))).alias("n_tok"), F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("h")
    )
    packed = chunked_running_offset(
        toks, "lang", "h", "doc_id", "n_tok", out_col="cum"
    ).withColumn("pack_id", F.floor(F.col("cum") / cap))
    return (
        packed.groupBy("lang", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
        )
        .select(
            "lang",
            F.col("pack_id").cast("long").alias("pack_id"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("total_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("lang", "pack_id")
    )


PACK_SEQUENCES_SQL = r"""
WITH toks AS (
    SELECT lang, doc_id,
           len(string_split_regex(trim(coalesce(text, '')), '[ \t\n\x0b\f\r]+')) AS n_tok,
           md5(coalesce(text, '')) AS h
    FROM documents
    WHERE doc_id IS NOT NULL
), c AS (
    SELECT lang, doc_id, n_tok,
           sum(n_tok) OVER (
               PARTITION BY lang ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - n_tok AS cum
    FROM toks
)
SELECT lang,
       CAST(floor(cum / 256.0) AS BIGINT) AS pack_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens
FROM c
GROUP BY lang, pack_id
ORDER BY lang, pack_id
"""


def text_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/shape quality gates: word count, mean word
    length, duplicate-word fraction, and the resulting keep/drop flag.
    Pure per-row expressions — narrow map stage, no shuffle, whole-stage
    codegen end to end; trivially scales (the only cost is the scan)."""
    docs = t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
    n_words = F.size(words).cast("long")
    squeezed = F.length(F.regexp_replace(F.coalesce(F.col("text"), F.lit("")), r"\s+", ""))
    mean_wl = ieee_round(squeezed / n_words, 6)
    dup_frac = ieee_round(
        1.0 - F.size(F.array_distinct(words)) / n_words, 6
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        dup_frac.alias("dup_word_frac"),
        (
            (n_words >= 20)
            & (mean_wl >= 2.0)
            & (mean_wl <= 10.0)
            & (dup_frac <= 0.8)
        ).alias("keep"),
    ).orderBy("doc_id")


_SQL_WORDS = r"string_split_regex(trim(coalesce(text, '')), '[ \t\n\x0b\f\r]+')"
_SQL_MEAN_WL = sql_ieee_round(
    r"length(regexp_replace(coalesce(text, ''), '[ \t\n\x0b\f\r]+', '', 'g')) * 1.0 / len(" + _SQL_WORDS + ")", 6
)
_SQL_DUP_FRAC = sql_ieee_round(
    "1.0 - len(list_distinct(" + _SQL_WORDS + ")) * 1.0 / len(" + _SQL_WORDS + ")", 6
)

TEXT_GOPHER_SQL = f"""
WITH m AS (
    SELECT doc_id,
           CAST(len({_SQL_WORDS}) AS BIGINT) AS n_words,
           {_SQL_MEAN_WL} AS mean_word_len,
           {_SQL_DUP_FRAC} AS dup_word_frac
    FROM documents
)
SELECT doc_id, n_words, mean_word_len, dup_word_frac,
       (n_words >= 20 AND mean_word_len BETWEEN 2.0 AND 10.0
        AND dup_word_frac <= 0.8) AS keep
FROM m
ORDER BY doc_id
"""


def mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture reweighting: per (lang, source) token totals, the
    stratum's share of the corpus, and the up/down-sampling weight that
    flattens the mixture to uniform. The groupBy is the only real shuffle;
    the post-agg windows run over |strata| rows (~100 at any corpus size),
    so the unpartitioned window is safe — it never sees raw data."""
    from ..operators.text import token_count

    docs = t(spark, sf_dir, "documents")
    strata = (
        docs.select("lang", "source", token_count(F.coalesce(F.col("text"), F.lit(""))).alias("n_tok"))
        .groupBy("lang", "source")
        .agg(F.sum("n_tok").alias("total_tokens"))
    )
    w_all = Window.partitionBy()
    share = F.col("total_tokens") / F.sum("total_tokens").over(w_all)
    uniform = 1.0 / F.count("*").over(w_all)
    return strata.select(
        "lang",
        "source",
        F.col("total_tokens").cast("long").alias("total_tokens"),
        ieee_round(share, 6).alias("share"),
        ieee_round(uniform / share, 6).alias("weight"),
    ).orderBy("lang", "source")


MIX_WEIGHTS_SQL = f"""
WITH s AS (
    SELECT lang, source,
           CAST(sum(len({_SQL_WORDS})) AS BIGINT)
               AS total_tokens
    FROM documents
    GROUP BY lang, source
)
SELECT lang, source, total_tokens,
       {sql_ieee_round("total_tokens * 1.0 / sum(total_tokens) OVER ()", 6)}
           AS share,
       {sql_ieee_round(
           "(1.0 / count(*) OVER ())"
           " / (total_tokens * 1.0 / sum(total_tokens) OVER ())", 6)}
           AS weight
FROM s
ORDER BY lang, source
"""


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination: flag corpus docs sharing any word 5-gram
    with the benchmark partition (source='src0' stands in for the eval
    set). Gram explosion is a flatMap (no shuffle); the gram-equality join
    is the shuffle — since r18 it runs on xxhash64(gram): 8-byte keys
    instead of ~30-char strings through the join, the dedup aggregate
    and count_distinct. Shared-gram COUNTS are hash-invariant (the
    engine-wide xxhash64 trade dedup_jaccard_pairs documents) and the
    string-exact oracle differential guards the equality. Benchmark
    grams are distinct'd; in
    production eval sets are tiny next to the corpus, so AQE/stats
    broadcast the distinct gram set and the check becomes a map-side
    semi-join. The hint is NOT forced here: in this data model 'src0'
    is a constant fraction of an SF-scaling corpus, and a forced
    broadcast of an SF-scaling side is driver OOM at the design point —
    the planner picks broadcast where stats fit and degrades to a
    shuffled join (not a crash) where they don't."""
    docs = t(spark, sf_dir, "documents")
    grams = (
        docs.select("doc_id", "source", F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+").alias("w"))
        .filter(F.size("w") >= 5)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 4),"
                    " i -> xxhash64(array_join(slice(w, i, 5), ' ')))"
                )
            ).alias("g"),
        )
    )
    # no distinct on the corpus side: count_distinct dedups after the join
    # anyway, so the only gram-wide shuffle is the final (doc_id, g) dedup —
    # the broadcast join itself stays map-side.
    bench = grams.filter(F.col("source") == "src0").select("g").distinct()
    return (
        grams.filter(F.col("source") != "src0")
        .join(bench, "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").cast("long").alias("n_shared_grams"))
        .orderBy("doc_id")
    )


DECONTAMINATE_SQL = r"""
WITH w AS (
    SELECT doc_id, source, string_split_regex(trim(coalesce(text, '')), '[ \t\n\x0b\f\r]+') AS w
    FROM documents
    WHERE len(string_split_regex(trim(coalesce(text, '')), '[ \t\n\x0b\f\r]+')) >= 5
), g AS (
    SELECT DISTINCT doc_id, source,
           array_to_string(list_slice(w, i, i + 4), ' ') AS g
    FROM w, unnest(generate_series(1, len(w) - 4)) AS t(i)
), b AS (
    SELECT DISTINCT g FROM g WHERE source = 'src0'
)
SELECT g.doc_id, CAST(count(DISTINCT g.g) AS BIGINT) AS n_shared_grams
FROM g JOIN b USING (g)
WHERE g.source <> 'src0'
GROUP BY g.doc_id
ORDER BY doc_id
"""


def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/string_agg): nations per region
    as a sorted comma list. collect_list is order-nondeterministic under
    parallelism — array_sort makes the result stable under any partition
    layout (the same reason the oracle SQL needs ORDER BY inside
    string_agg). Broadcast dim join + 5-group agg: trivially scalable."""
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("_nations"),
            F.count("n_name").alias("_non_null"),
            F.count("*").alias("n_nations"),
        )
        # SQL string_agg over zero non-NULL values is NULL; collect_list
        # skips NULLs so an all-NULL group would yield "" here. Caught by
        # the degenerate-nation net.
        .select(
            "r_name",
            F.when(F.col("_non_null") > 0, F.col("_nations")).alias("nations"),
            F.col("n_nations").cast("long").alias("n_nations"),
        )
        .orderBy("r_name")
    )


AGG_STRING_CONCAT_SQL = """
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       CAST(count(*) AS BIGINT) AS n_nations
FROM nation
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over per-customer order
    history. last_value gets an explicit UNBOUNDED-to-UNBOUNDED frame (the
    default frame ends at CURRENT ROW, which silently makes last_value ≡
    current row — in both engines). One shuffle on o_custkey."""
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc_nulls_last(),
        F.col("o_orderkey").asc_nulls_last(),
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.first("o_totalprice").over(w).alias("first_price"),
            F.last("o_totalprice").over(w_full).alias("last_price"),
            F.nth_value("o_totalprice", 2).over(w_full).alias("second_price"),
        )
        .select(
            "o_custkey",
            "o_orderkey",
            ieee_round(F.col("first_price"), 2).alias("first_price"),
            ieee_round(F.col("last_price"), 2).alias("last_price"),
            ieee_round(F.col("second_price"), 2).alias("second_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


WINDOW_VALUE_FUNCTIONS_SQL = f"""
SELECT o_custkey, o_orderkey,
       {sql_ieee_round("first_value(o_totalprice) OVER w")} AS first_price,
       {sql_ieee_round("last_value(o_totalprice) OVER w_full")} AS last_price,
       {sql_ieee_round("nth_value(o_totalprice, 2) OVER w_full")} AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_orderdate NULLS LAST, o_orderkey NULLS LAST),
       w_full AS (PARTITION BY o_custkey
                  ORDER BY o_orderdate NULLS LAST, o_orderkey NULLS LAST
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_custkey, o_orderkey
"""


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG/embedding-prep chunking: sliding word windows of 50 tokens with
    10-token overlap (stride 40), entirely with built-ins — sequence for
    the chunk starts, slice+array_join per chunk, one explode. A flatMap:
    zero shuffles besides the output sort, scales with the scan. The
    chunk_idx is derived arithmetically from the start offset so it is
    stable under any row or partition order."""
    docs = t(spark, sf_dir, "documents")
    w = F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
    exploded = (
        docs.select("doc_id", w.alias("w"))
        .select(
            "doc_id",
            "w",
            F.explode(
                F.expr("sequence(1, greatest(size(w) - 10, 1), 40)")
            ).alias("s"),
        )
    )
    return exploded.select(
        "doc_id",
        ((F.col("s") - 1) / 40).cast("long").alias("chunk_idx"),
        F.array_join(F.expr("slice(w, s, 50)"), " ").alias("chunk_text"),
        F.expr("size(slice(w, s, 50))").cast("long").alias("n_chunk_tokens"),
    ).orderBy("doc_id", "chunk_idx")


CHUNK_DOCUMENTS_SQL = r"""
WITH w AS (
    SELECT doc_id, string_split_regex(trim(coalesce(text, '')), '[ \t\n\x0b\f\r]+') AS w FROM documents
), s AS (
    SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 10, 1), 40)) AS s
    FROM w
)
SELECT doc_id,
       CAST((s - 1) // 40 AS BIGINT) AS chunk_idx,
       array_to_string(list_slice(w, s, s + 49), ' ') AS chunk_text,
       CAST(len(list_slice(w, s, s + 49)) AS BIGINT) AS n_chunk_tokens
FROM s
ORDER BY doc_id, chunk_idx
"""


# Identical SQL text runs on BOTH engines (Spark 4 and DuckDB support
# WITH RECURSIVE) — the one entry where the "Spark side" is spark.sql of
# the oracle itself, because recursion has no DataFrame-API spelling.
RECURSIVE_MONTH_SPINE_SQL = """
WITH RECURSIVE months(m) AS (
    SELECT 1
    UNION ALL
    SELECT m + 1 FROM months WHERE m < 12
)
SELECT m AS month,
       CAST(count(o_orderkey) AS BIGINT) AS n_orders
FROM months
LEFT JOIN orders
  ON EXTRACT(MONTH FROM o_orderdate) = m
 AND EXTRACT(YEAR FROM o_orderdate) = 1995
GROUP BY m
ORDER BY m
"""


def recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): a 12-row month spine
    left-joined to 1995 order counts — months with no orders still appear.
    The recursion materializes 12 rows on the driver side of the plan and
    broadcasts; the fact side aggregates with partial combine. Spine
    recursion depth is constant — safe at any data scale."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(RECURSIVE_MONTH_SPINE_SQL)


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

CATALOG: dict[str, Entry] = {
    "q1_avg_price_by_nation": Entry(q1_avg_price_by_nation, Q1_SQL),
    "q2_count_by_nation_region": Entry(q2_count_by_nation_region, Q2_SQL),
    "q3_pct_of_total": Entry(q3_pct_of_total, Q3_SQL),
    "proj_filter": Entry(proj_filter, PROJ_FILTER_SQL),
    "derived_cast_round": Entry(derived_cast_round, DERIVED_CAST_ROUND_SQL),
    "string_split": Entry(string_split, STRING_SPLIT_SQL),
    "cond_compass_format": Entry(cond_compass_format, COND_COMPASS_SQL),
    "date_parts": Entry(date_parts, DATE_PARTS_SQL),
    "sas_date_convert": Entry(sas_date_convert, SAS_DATE_SQL),
    "join_left_counts": Entry(join_left_counts, JOIN_LEFT_SQL),
    "join_semi": Entry(join_semi, JOIN_SEMI_SQL),
    "join_anti": Entry(join_anti, JOIN_ANTI_SQL),
    "join_multiway_revenue": Entry(join_multiway_revenue, JOIN_MULTIWAY_SQL),
    "agg_distinct": Entry(agg_distinct, AGG_DISTINCT_SQL),
    "agg_pivot": Entry(agg_pivot, AGG_PIVOT_SQL),
    "dedup_first_wins": Entry(dedup_first_wins, DEDUP_FIRST_WINS_SQL),
    "agg_stats_summary": Entry(agg_stats_summary, AGG_STATS_SQL),
    "surrogate_ids": Entry(surrogate_ids, SURROGATE_IDS_SQL),
    "topk_per_group": Entry(topk_per_group, TOPK_SQL),
    "set_union": Entry(set_union, SET_UNION_SQL),
    "set_except": Entry(set_except, SET_EXCEPT_SQL),
    "events_hourly": Entry(events_hourly, EVENTS_HOURLY_SQL),
    "events_json": Entry(events_json, EVENTS_JSON_SQL),
    "text_token_stats": Entry(text_token_stats, TEXT_TOKEN_STATS_SQL),
    "doc_fingerprint": Entry(doc_fingerprint, DOC_FINGERPRINT_SQL),
    "dedup_exact": Entry(dedup_exact, DEDUP_EXACT_SQL),
    "text_lang_id": Entry(text_lang_id, None),  # sql built lazily below
    "text_quality": Entry(text_quality, TEXT_QUALITY_SQL),
    "text_bpe_count": Entry(text_bpe_count, TEXT_BPE_COUNT_SQL),
    "dedup_jaccard_pairs": Entry(dedup_jaccard_pairs, DEDUP_JACCARD_SQL),
    "dedup_minhash_lsh": Entry(dedup_minhash_lsh, None),
    "dedup_simhash": Entry(dedup_simhash, None),
    "dedup_embedding_cosine": Entry(dedup_embedding_cosine, DEDUP_EMBEDDING_SQL),
    "similarity_topk": Entry(similarity_topk, SIMILARITY_TOPK_SQL),
    "similarity_lsh_topk": Entry(similarity_lsh_topk, None),
    "events_sessionize": Entry(events_sessionize, EVENTS_SESSIONIZE_SQL),
    "agg_rollup": Entry(agg_rollup, AGG_ROLLUP_SQL),
    "join_asof_events": Entry(join_asof_events, JOIN_ASOF_SQL),
    "agg_cube": Entry(agg_cube, AGG_CUBE_SQL),
    "unpivot_part": Entry(unpivot_part, UNPIVOT_SQL),
    "agg_percentiles": Entry(agg_percentiles, AGG_PERCENTILES_SQL),
    "window_running_sum": Entry(window_running_sum, WINDOW_RUNNING_SQL),
    "join_range_bucketed": Entry(join_range_bucketed, JOIN_RANGE_SQL),
    "merge_scd2": Entry(merge_scd2, MERGE_SCD2_SQL),
    "agg_distinct_count": Entry(agg_distinct_count, AGG_DISTINCT_COUNT_SQL),
    "agg_approx": Entry(agg_approx, AGG_APPROX_SQL),
    "similarity_ivf_topk": Entry(similarity_ivf_topk, None),  # k-means nondet.
    "dedup_resolve_clusters": Entry(dedup_resolve_clusters, None),  # iterative
    "events_json_struct": Entry(events_json_struct, EVENTS_JSON_STRUCT_SQL),
    "string_functions": Entry(string_functions, STRING_FUNCTIONS_SQL),
    "array_explode_agg": Entry(array_explode_agg, ARRAY_EXPLODE_SQL),
    "agg_grouping_sets": Entry(agg_grouping_sets, AGG_GROUPING_SETS_SQL),
    "window_lag_lead": Entry(window_lag_lead, WINDOW_LAG_LEAD_SQL),
    "multimodal_decode": Entry(multimodal_decode, None),  # no media oracle table
    "multimodal_features": Entry(multimodal_features, None),
}
CATALOG["text_lang_id"] = Entry(text_lang_id, _text_lang_id_sql())
CATALOG.update(
    {
        "subquery_scalar_avg": Entry(subquery_scalar_avg, SUBQUERY_SCALAR_SQL),
        "subquery_correlated_avg": Entry(
            subquery_correlated_avg, SUBQUERY_CORRELATED_SQL
        ),
        "agg_having": Entry(agg_having, AGG_HAVING_SQL),
        "set_intersect": Entry(set_intersect, SET_INTERSECT_SQL),
        "window_ntile_pctrank": Entry(window_ntile_pctrank, WINDOW_NTILE_SQL),
        "window_moving_avg": Entry(window_moving_avg, WINDOW_MOVING_AVG_SQL),
        "date_arithmetic": Entry(date_arithmetic, DATE_ARITHMETIC_SQL),
        "string_regexp": Entry(string_regexp, STRING_REGEXP_SQL),
        "agg_stats_funcs": Entry(agg_stats_funcs, AGG_STATS_FUNCS_SQL),
        "agg_conditional": Entry(agg_conditional, AGG_CONDITIONAL_SQL),
        "split_assign": Entry(split_assign, SPLIT_ASSIGN_SQL),
        "profile_columns": Entry(profile_columns, PROFILE_COLUMNS_SQL),
        "gapfill_resample": Entry(gapfill_resample, GAPFILL_SQL),
        "large_order_customers": Entry(large_order_customers, LARGE_ORDER_SQL),
        "sample_stratified": Entry(sample_stratified, SAMPLE_STRATIFIED_SQL),
        "pack_sequences": Entry(pack_sequences, PACK_SEQUENCES_SQL),
        "text_gopher_filters": Entry(text_gopher_filters, TEXT_GOPHER_SQL),
        "mix_weights": Entry(mix_weights, MIX_WEIGHTS_SQL),
        "decontaminate": Entry(decontaminate, DECONTAMINATE_SQL),
        "recursive_month_spine": Entry(
            recursive_month_spine, RECURSIVE_MONTH_SPINE_SQL
        ),
        "chunk_documents": Entry(chunk_documents, CHUNK_DOCUMENTS_SQL),
        "window_value_functions": Entry(
            window_value_functions, WINDOW_VALUE_FUNCTIONS_SQL
        ),
        "agg_string_concat": Entry(agg_string_concat, AGG_STRING_CONCAT_SQL),
        # driver-visible invariant checks for the rows-only operators
        "check_minhash_containment": Entry(
            check_minhash_containment, CHECK_MINHASH_SQL
        ),
        "check_simhash_invariants": Entry(check_simhash_invariants, CHECK_SIMHASH_SQL),
        "check_lsh_topk": Entry(check_lsh_topk, CHECK_ANN_RECALL_SQL),
        "check_ivf_topk": Entry(check_ivf_topk, CHECK_ANN_SQL),
        "check_cluster_consistency": Entry(
            check_cluster_consistency, CHECK_CLUSTERS_SQL
        ),
        # r2 surface widening
        "join_null_safe": Entry(join_null_safe, JOIN_NULL_SAFE_SQL),
        "array_higher_order": Entry(array_higher_order, ARRAY_HIGHER_ORDER_SQL),
        "pii_redact": Entry(pii_redact, PII_REDACT_SQL),
        "source_token_budget": Entry(source_token_budget, SOURCE_TOKEN_BUDGET_SQL),
        "text_dup_bigrams": Entry(text_dup_bigrams, TEXT_DUP_BIGRAMS_SQL),
        "token_histogram": Entry(token_histogram, TOKEN_HISTOGRAM_SQL),
        "agg_distinct_twophase": Entry(
            agg_distinct_twophase, AGG_DISTINCT_TWOPHASE_SQL
        ),
        "window_range_frame": Entry(window_range_frame, WINDOW_RANGE_FRAME_SQL),
        "agg_boolean_funcs": Entry(agg_boolean_funcs, AGG_BOOLEAN_FUNCS_SQL),
        "events_session_window": Entry(
            events_session_window, EVENTS_SESSION_WINDOW_SQL
        ),
        "ngram_counts": Entry(ngram_counts, NGRAM_COUNTS_SQL),
        "clip_outliers": Entry(clip_outliers, CLIP_OUTLIERS_SQL),
        "tfidf_top_terms": Entry(tfidf_top_terms, TFIDF_TOP_TERMS_SQL),
        "split_no_leakage": Entry(split_no_leakage, SPLIT_NO_LEAKAGE_SQL),
        "cdc_apply_changes": Entry(cdc_apply_changes, CDC_APPLY_CHANGES_SQL),
        "ansi_safe_casts": Entry(ansi_safe_casts, ANSI_SAFE_CASTS_SQL),
        "fuzzy_name_pairs": Entry(fuzzy_name_pairs, FUZZY_NAME_PAIRS_SQL),
        "union_schema_evolution": Entry(
            union_schema_evolution, UNION_SCHEMA_EVOLUTION_SQL
        ),
        "posexplode_tokens": Entry(posexplode_tokens, POSEXPLODE_TOKENS_SQL),
        "check_multimodal": Entry(check_multimodal, CHECK_MULTIMODAL_SQL),
        "check_png_pixels": Entry(check_png_pixels, CHECK_PNG_PIXELS_SQL),
        "check_pixel_parity": Entry(check_pixel_parity, CHECK_PIXEL_PARITY_SQL),
        "check_wav_samples": Entry(check_wav_samples, CHECK_WAV_SAMPLES_SQL),
        "text_char_entropy": Entry(text_char_entropy, TEXT_CHAR_ENTROPY_SQL),
    }
)


# ---------------------------------------------------------------------------
# Driver-window rotation (round 4)
#
# The correctness driver evaluates only the FIRST 50 entries of ``queries()``
# in registration order. Rounds 1-3 all checked the same original first 50
# (CORRECTNESS_r01-r03: 45 full hash-match, 5 rows-only, 0 mismatches); the
# 54 entries registered since round 1 never received a driver row. Rotate 50
# of those to the front so CORRECTNESS_r04 covers them; the proven 50 keep
# their record from r01-r03 and move behind the cutoff.
#
# Leading the window: the six ``check_*`` invariant entries — they carry
# DuckDB-anchored oracles for exactly the five families the driver has been
# recording as ``err: no_oracle`` (MinHash, SimHash, LSH/IVF top-k, cluster
# resolution) plus the multimodal pipeline, converting those gaps into
# driver-verifiable rows.
#
# Held out for the round-5 window (4 = 54 - 50): ``multimodal_decode`` /
# ``multimodal_features`` (binary media; cannot hash-check against DuckDB —
# ``check_multimodal`` is their driver-visible proxy) and
# ``date_arithmetic`` / ``string_regexp`` (single-table scalar surfaces,
# pinned by the local oracle twin in tests/test_oracle_differential.py).
# The entry → proving-round ledger lives in COVERAGE.md §Driver ledger.
# ---------------------------------------------------------------------------

_DRIVER_WINDOW_R4 = [
    # invariant checks for the five standing no_oracle rows + multimodal
    "check_minhash_containment",
    "check_simhash_invariants",
    "check_lsh_topk",
    "check_ivf_topk",
    "check_cluster_consistency",
    "check_multimodal",
    # LLM-data-pipeline families
    "pack_sequences",
    "source_token_budget",
    "split_no_leakage",
    "decontaminate",
    "tfidf_top_terms",
    "pii_redact",
    "cdc_apply_changes",
    "fuzzy_name_pairs",
    "text_gopher_filters",
    "mix_weights",
    "chunk_documents",
    "text_dup_bigrams",
    "token_histogram",
    "ngram_counts",
    "clip_outliers",
    "text_char_entropy",
    "sample_stratified",
    "posexplode_tokens",
    # SQL-surface widening
    "subquery_scalar_avg",
    "subquery_correlated_avg",
    "agg_having",
    "set_intersect",
    "window_ntile_pctrank",
    "window_moving_avg",
    "agg_stats_funcs",
    "agg_conditional",
    "split_assign",
    "profile_columns",
    "gapfill_resample",
    "large_order_customers",
    "recursive_month_spine",
    "window_value_functions",
    "agg_string_concat",
    "join_null_safe",
    "array_higher_order",
    "agg_distinct_twophase",
    "window_range_frame",
    "agg_boolean_funcs",
    "events_session_window",
    "ansi_safe_casts",
    "union_schema_evolution",
    "array_explode_agg",
    "agg_grouping_sets",
    "window_lag_lead",
]
assert len(_DRIVER_WINDOW_R4) == 50, len(_DRIVER_WINDOW_R4)

from .catalog_r5 import R5_ENTRIES  # noqa: E402  (needs Entry/t defined above)

CATALOG.update(R5_ENTRIES)

from .catalog_r6 import R6_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R6_ENTRIES)

from .catalog_r6b import R6B_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R6B_ENTRIES)

from .catalog_r6c import R6C_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R6C_ENTRIES)

from .catalog_r6d import R6D_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R6D_ENTRIES)

from .catalog_r6e import R6E_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R6E_ENTRIES)

from .catalog_r6f import R6F_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R6F_ENTRIES)

from .catalog_r6g import R6G_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R6G_ENTRIES)

from .catalog_r6h import R6H_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R6H_ENTRIES)

from .catalog_r6i import R6I_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R6I_ENTRIES)

from .catalog_r6j import R6J_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R6J_ENTRIES)

from .catalog_r6k import R6K_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R6K_ENTRIES)

from .catalog_r6l import R6L_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R6L_ENTRIES)

from .catalog_r6m import R6M_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R6M_ENTRIES)

from .catalog_r6n import R6N_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R6N_ENTRIES)

from .catalog_r6o import R6O_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R6O_ENTRIES)

from .catalog_r6p import R6P_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R6P_ENTRIES)

from .catalog_r6q import R6Q_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R6Q_ENTRIES)

from .catalog_r6r import R6R_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R6R_ENTRIES)

from .catalog_r6s import R6S_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R6S_ENTRIES)

from .catalog_r7 import R7_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R7_ENTRIES)

from .catalog_r7b import R7B_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R7B_ENTRIES)

from .catalog_r7c import R7C_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R7C_ENTRIES)

from .catalog_r7d import R7D_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R7D_ENTRIES)

from .catalog_r7e import R7E_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R7E_ENTRIES)

from .catalog_r7g import R7G_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R7G_ENTRIES)

from .catalog_r7h import R7H_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R7H_ENTRIES)

from .catalog_r7i import R7I_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R7I_ENTRIES)

from .catalog_r7j import R7J_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R7J_ENTRIES)

from .catalog_r7k import R7K_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R7K_ENTRIES)

from .catalog_r7l import R7L_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R7L_ENTRIES)

from .catalog_r8 import R8_ENTRIES  # noqa: E402  (same deferred-import reason)

CATALOG.update(R8_ENTRIES)

# Round-5 driver window. The driver evaluates queries()[:50] in
# registration order; COVERAGE.md maps every entry to the round that
# proved it.
#
# R6 ROTATION NOTE: after this round the only entries with no driver row
# are the five registered post-rotation (vocab_coverage,
# source_dup_matrix, embedding_centroids, dup_graph_degree,
# events_gap_stats) — lead the next window with them, keep at least one
# events_table consumer in every window as the shared-helper canary, and
# fill the rest with the oldest driver records (r4 window first). This window = (a) the events family, whose pre-r4 green
# rows predate the testdata regeneration that switched events.ts from
# TIMESTAMP(NANOS) to timestamp[us] (the r4 regression this round
# fixes), (b) the four entries that have never had a driver row,
# (c) the ten new round-5 entries, (d) re-confirmation of the highest-
# value r3-window entries against the regenerated data.
_DRIVER_WINDOW_R5 = [
    # (a) events family — regression re-verification
    "events_hourly",
    "events_json",
    "events_sessionize",
    "events_json_struct",
    "events_session_window",
    "gapfill_resample",
    "join_asof_events",
    # (b) never driver-checked
    "date_arithmetic",
    "string_regexp",
    "multimodal_decode",
    "multimodal_features",
    # (c) new round-5 entries
    "text_dedup_tokens",
    "dup_passage_docs",
    "token_bigram_pmi",
    "bm25_scores",
    "doc_length_percentiles",
    "dedup_incremental",
    "sample_hash_quota",
    "skew_salted_agg",
    "quality_curriculum",
    "embedding_quantize",
    "agg_modes",
    "events_multires_rollup",
    # (d) r3-window re-confirmation on regenerated testdata
    "q1_avg_price_by_nation",
    "q2_count_by_nation_region",
    "q3_pct_of_total",
    "join_multiway_revenue",
    "dedup_exact",
    "dedup_first_wins",
    "dedup_jaccard_pairs",
    "dedup_embedding_cosine",
    "similarity_topk",
    "topk_per_group",
    "agg_stats_summary",
    "text_token_stats",
    "text_lang_id",
    "text_quality",
    "text_bpe_count",
    "doc_fingerprint",
    "agg_pivot",
    "agg_rollup",
    "agg_cube",
    "unpivot_part",
    "agg_percentiles",
    "window_running_sum",
    "join_range_bucketed",
    "merge_scd2",
    "agg_distinct_count",
    "agg_approx",
    "string_functions",
]
assert len(_DRIVER_WINDOW_R5) == 50, len(_DRIVER_WINDOW_R5)

# Round-6 driver window (the driver evaluates queries()[:50] in
# registration order).
#
# Composition, per the R6 ROTATION NOTE above:
# (a) the five entries registered after the r5 cutoff — the only catalog
#     entries with NO driver row in any round; both-SF oracle
#     differentials ran green before this rotation (round-6 session).
# (b) events_session_window — the shared-helper canary: an events_table
#     consumer with a green r5 row, so a regression in the shared events
#     normalization is attributable to the helper, not to a new entry.
#     (events_gap_stats in (a) also consumes events_table, but has no
#     prior green row to anchor on.)
# (c) 44 of the 48 r4-window entries whose latest driver record is r4 —
#     the oldest records in the ledger. gapfill_resample is excluded
#     (re-verified r5); four pure-SQL entries with direct local-sweep
#     backstops and in-window siblings are deferred to r7 for space:
#     subquery_scalar_avg (sibling subquery_correlated_avg stays),
#     agg_having, set_intersect, window_moving_avg (window_range_frame
#     and window_ntile_pctrank stay).
#
# R7 ROTATION NOTE: lead with the entries that have no driver row after
# this round — the SEVENTY-FOUR round-6 registrations (they exceed a
# 50-slot window minus canary+backlog, so split across r7 and r8: r7
# takes the oldest-registered two-thirds plus the four r4 deferrals,
# r8 takes the rest; every one is both-SF oracle-verified and swept
# locally, so the only missing signal is the external driver row).
# The thirty-three: (kl_source_drift,
# dsir_importance, exact_substr_spans, curation_pipeline from
# catalog_r6; bpe_merge_pairs, decontaminate_embedding, semdedup_prune,
# shard_balance, boilerplate_windows, perplexity_score,
# dedup_soft_weights, sketch_hll_union, events_funnel,
# events_retention_cohorts from catalog_r6b; sketch_cms_topk,
# join_range_buckets, events_transition_matrix, events_anomaly_zscore,
# events_time_decay, agg_robust_mad, rolling_distinct_users from
# catalog_r6c; sample_weighted, skew_salted_join, agg_correlation,
# chi_square_independence, table_fingerprints from catalog_r6d;
# pagerank_event_graph, kmeans_embeddings, nb_source_classifier,
# logreg_gd_weights from catalog_r6e; info_gain_terms, event_paths,
# linreg_by_group, events_json_variant, join_attribution_window,
# er_golden_records (+check_er_mass twin) from catalog_r6f;
# user_activity_features, pit_features, churn_labels from catalog_r6g;
# simjoin_prefix, graph_triangles, basket_lift, graph_core_peel
# from catalog_r6h;
# q5_local_volume, q8_market_share, q10_returned_items,
# q14_promo_revenue, q15_top_supplier from catalog_r6i;
# rrf_fusion, ndcg_label_eval from catalog_r6j;
# sample_universe, rfm_segments, revenue_pareto,
# quantile_norm_lengths from catalog_r6k; ab_test_analysis,
# benford_digit_test, events_seasonality, ri_audit from catalog_r6l;
# events_markov_stationary, funnel_time_to_convert from catalog_r6m;
# orders_cohort_ltv, abc_classification, session_bounce_rate from
# catalog_r6n; funnel_strict_sequence, skew_profile from catalog_r6o;
# langid_confusion, embedding_norm_outliers from catalog_r6p;
# survival_signup_purchase, churn_feature_lift from catalog_r6q;
# text_readability, zipf_fit from catalog_r6r;
# orders_gini, welch_ttest from catalog_r6s;
# all both-SF
# oracle-verified locally (er_golden_records rows-only by design))
# and the four r4-window deferrals below (subquery_scalar_avg,
# agg_having, set_intersect, window_moving_avg) — keep an events_table
# consumer as canary, fill the rest with the oldest records (the r5
# window: events family + round-5 entries + r3 re-confirmations).
_DRIVER_WINDOW_R6 = [
    # (a) never driver-checked
    "vocab_coverage",
    "source_dup_matrix",
    "embedding_centroids",
    "dup_graph_degree",
    "events_gap_stats",
    # (b) shared-helper canary (events_table; green r5 row)
    "events_session_window",
    # (c) oldest driver records — r4 window
    "check_minhash_containment",
    "check_simhash_invariants",
    "check_lsh_topk",
    "check_ivf_topk",
    "check_cluster_consistency",
    "check_multimodal",
    "pack_sequences",
    "source_token_budget",
    "split_no_leakage",
    "decontaminate",
    "tfidf_top_terms",
    "pii_redact",
    "cdc_apply_changes",
    "fuzzy_name_pairs",
    "text_gopher_filters",
    "mix_weights",
    "chunk_documents",
    "text_dup_bigrams",
    "token_histogram",
    "ngram_counts",
    "clip_outliers",
    "text_char_entropy",
    "sample_stratified",
    "posexplode_tokens",
    "subquery_correlated_avg",
    "window_ntile_pctrank",
    "agg_stats_funcs",
    "agg_conditional",
    "split_assign",
    "profile_columns",
    "large_order_customers",
    "recursive_month_spine",
    "window_value_functions",
    "agg_string_concat",
    "join_null_safe",
    "array_higher_order",
    "agg_distinct_twophase",
    "window_range_frame",
    "agg_boolean_funcs",
    "ansi_safe_casts",
    "union_schema_evolution",
    "array_explode_agg",
    "agg_grouping_sets",
    "window_lag_lead",
]
assert len(_DRIVER_WINDOW_R6) == 50, len(_DRIVER_WINDOW_R6)

# Round-7 driver window (the driver evaluates queries()[:50] in
# registration order).
#
# Composition, per the R7 ROTATION NOTE above and the round-6 verdict:
# (a) events_session_window — the shared-helper canary (green r5 AND r6
#     rows, so an events_table normalization regression is attributable
#     to the helper, not to the 18 first-time events consumers below).
# (b) the four r4-window deferrals (their r4 rows are now the oldest in
#     the ledger and they were explicitly held out of the r6 window).
# (c) 45 of the 74 round-6 registrations that have never had a driver
#     row, ordered per the round-6 verdict: the bench-timed heavies
#     first (they carry the perf watch items), then the five TPC-H
#     classics, then the r6m-r6s analytics batches, then the oldest-
#     registered remainder (catalog_r6 -> r6c).
#
# R8 ROTATION NOTE: after this round the only entries with no driver
# row are the 29 round-6 registrations that did not fit here:
# sample_weighted,
# agg_correlation, chi_square_independence, table_fingerprints from
# catalog_r6d; kmeans_embeddings, nb_source_classifier,
# logreg_gd_weights from catalog_r6e; info_gain_terms, event_paths,
# linreg_by_group, events_json_variant, join_attribution_window,
# er_golden_records, check_er_mass from catalog_r6f;
# user_activity_features, pit_features, churn_labels from catalog_r6g;
# basket_lift, graph_core_peel from catalog_r6h; rrf_fusion,
# ndcg_label_eval from catalog_r6j; sample_universe, rfm_segments,
# revenue_pareto, quantile_norm_lengths from catalog_r6k;
# ab_test_analysis, benford_digit_test, events_seasonality, ri_audit
# from catalog_r6l — plus the 25 round-7 registrations (catalog_r7:
# ks_two_sample, mann_whitney_u, spearman_corr, cohens_kappa,
# calibration_curve, pareto_skyline, orders_acf, cusum_drift;
# catalog_r7b: q3_unshipped_topk, q4_late_exists, q6_forecast_delta,
# q7_nation_volume, q9_profit_proxy, q13_order_histogram,
# q17_small_qty_revenue, q18_large_orders, q19_disjunctive_join,
# q21_sole_late_supplier, q22_dormant_customers; catalog_r7c:
# two_phase_quantiles, weighted_median, price_histogram; catalog_r7d:
# events_burst_hours, customer_active_streaks, priority_mix_shift;
# catalog_r7e: forecast_mase, conversion_wilson_ci, hierarchy_share;
# catalog_r7g: roc_auc_eval, ewma_control, bloom_prefilter_join;
# catalog_r7h: geo_grid_join, bootstrap_ci_mean, psi_price_drift;
# catalog_r7i: dbscan_customers, knn_graph_radius;
# catalog_r7j: target_encode_oof, conformal_interval;
# catalog_r7k: lateral_topk, trimmed_mean_price;
# catalog_r7l: join_asof_tolerance, recursive_reachability;
# plus check_png_pixels, check_pixel_parity, and check_wav_samples,
# the full pixel/sample-decode invariants registered in this file).
# That is 74 candidates for 50 slots: lead with the 29 r6 stragglers
# (oldest debt first), then the r7 batches in registration order, keep
# one events_table canary with a prior green row, and queue the
# overflow (~25, take from the end of r7l + r7k + r7j) for r9 with a
# note.
_DRIVER_WINDOW_R7 = [
    # (a) shared-helper canary (events_table; green r5 + r6 rows)
    "events_session_window",
    # (b) r4-window deferrals — oldest ledger records
    "subquery_scalar_avg",
    "agg_having",
    "set_intersect",
    "window_moving_avg",
    # (c1) bench-timed heavies (perf watch items ride with them)
    "simjoin_prefix",
    "graph_triangles",
    "skew_salted_join",
    "pagerank_event_graph",
    "sketch_cms_topk",
    "semdedup_prune",
    "dsir_importance",
    "exact_substr_spans",
    "kl_source_drift",
    "boilerplate_windows",
    # (c2) TPC-H classics (catalog_r6i)
    "q5_local_volume",
    "q8_market_share",
    "q10_returned_items",
    "q14_promo_revenue",
    "q15_top_supplier",
    # (c3) r6m-r6s analytics batches
    "events_markov_stationary",
    "funnel_time_to_convert",
    "orders_cohort_ltv",
    "abc_classification",
    "session_bounce_rate",
    "funnel_strict_sequence",
    "skew_profile",
    "langid_confusion",
    "embedding_norm_outliers",
    "survival_signup_purchase",
    "churn_feature_lift",
    "text_readability",
    "zipf_fit",
    "orders_gini",
    "welch_ttest",
    # (c4) oldest-registered remainder (catalog_r6 -> r6c)
    "curation_pipeline",
    "bpe_merge_pairs",
    "decontaminate_embedding",
    "shard_balance",
    "perplexity_score",
    "dedup_soft_weights",
    "sketch_hll_union",
    "events_funnel",
    "events_retention_cohorts",
    "join_range_buckets",
    "events_transition_matrix",
    "events_anomaly_zscore",
    "events_time_decay",
    "agg_robust_mad",
    "rolling_distinct_users",
]
assert len(_DRIVER_WINDOW_R7) == 50, len(_DRIVER_WINDOW_R7)

# ROUND-8 WINDOW — built from the recomputed never-checked ledger (union
# of CORRECTNESS_r01..r07 vs CATALOG keys: 75 candidates after this
# round's one new registration, check_dbscan_fixpoint). Ordering:
# (a) the 29 round-6 registrations with no driver row — oldest debt
#     first, in registration order (r6d -> r6l). Includes check_er_mass,
#     the ER survivorship invariant.
# (b) the three pixel/sample-decode invariants (check_png_pixels,
#     check_pixel_parity, check_wav_samples) — the no-oracle decoders'
#     driver-visible story currently rests on r6's check_multimodal
#     alone (round-7 verdict #3).
# (c) the full r7b TPC-H batch (11) plus the four marquee SQL-surface
#     entries (two_phase_quantiles, lateral_topk, join_asof_tolerance,
#     recursive_reachability) — the queries a migrating user exercises
#     first (round-7 verdict #4).
# (d) the DBSCAN perf-watch pair (dbscan_customers, knn_graph_radius —
#     bench-timed heavies, never correctness-checked) and
#     check_dbscan_fixpoint, the driver-visible convergence proof that
#     closes the round-7 verdict's one perf-weak item (#2).
# Deviation from the r7 note's pure registration order: the r7 stats
# batch (ks_two_sample .. cusum_drift) yields its slots to the
# verdict-named (b)/(c)/(d) items. No repeat canary this round — all 50
# slots retire debt, and the events-family stragglers in (a)
# (event_paths, events_json_variant, join_attribution_window,
# events_seasonality) exercise the same shared events reader the old
# canary guarded.
#
# R9 ROTATION NOTE: after this round the never-checked queue is exactly
# the 25 below (plus any r8 registrations) — lead r9 with the oldest:
# catalog_r7 stats batch: ks_two_sample, mann_whitney_u, spearman_corr,
# cohens_kappa, calibration_curve, pareto_skyline, orders_acf,
# cusum_drift; catalog_r7c: weighted_median, price_histogram;
# catalog_r7d: events_burst_hours, customer_active_streaks,
# priority_mix_shift; catalog_r7e: forecast_mase, conversion_wilson_ci,
# hierarchy_share; catalog_r7g: roc_auc_eval, ewma_control,
# bloom_prefilter_join; catalog_r7h: geo_grid_join, bootstrap_ci_mean,
# psi_price_drift; catalog_r7j: target_encode_oof, conformal_interval;
# catalog_r7k: trimmed_mean_price — plus the 6 round-8 registrations
# (catalog_r8: q1_pricing_summary, q2_min_cost_supplier,
# q11_important_share, q12_priority_lateness, q16_supplier_part_counts,
# q20_volume_share_suppliers — completing the 22-query TPC-H family;
# check_dbscan_fixpoint, the round's other registration, is IN this
# window, not queued). 31 candidates for 50 slots: the whole queue
# fits, so r9 should clear it to zero and backfill remaining slots
# with re-checks of the bench-timed heavies.
_DRIVER_WINDOW_R8 = [
    # (a) round-6 stragglers, registration order r6d -> r6l
    "sample_weighted",
    "agg_correlation",
    "chi_square_independence",
    "table_fingerprints",
    "kmeans_embeddings",
    "nb_source_classifier",
    "logreg_gd_weights",
    "info_gain_terms",
    "event_paths",
    "linreg_by_group",
    "events_json_variant",
    "join_attribution_window",
    "er_golden_records",
    "check_er_mass",
    "user_activity_features",
    "pit_features",
    "churn_labels",
    "basket_lift",
    "graph_core_peel",
    "rrf_fusion",
    "ndcg_label_eval",
    "sample_universe",
    "rfm_segments",
    "revenue_pareto",
    "quantile_norm_lengths",
    "ab_test_analysis",
    "benford_digit_test",
    "events_seasonality",
    "ri_audit",
    # (b) pixel/sample-decode invariants
    "check_png_pixels",
    "check_pixel_parity",
    "check_wav_samples",
    # (c) TPC-H r7b + marquee SQL-surface entries
    "q3_unshipped_topk",
    "q4_late_exists",
    "q6_forecast_delta",
    "q7_nation_volume",
    "q9_profit_proxy",
    "q13_order_histogram",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive_join",
    "q21_sole_late_supplier",
    "q22_dormant_customers",
    "two_phase_quantiles",
    "lateral_topk",
    "join_asof_tolerance",
    "recursive_reachability",
    # (d) DBSCAN perf-watch pair + convergence proof
    "dbscan_customers",
    "knn_graph_radius",
    "check_dbscan_fixpoint",
]
assert len(_DRIVER_WINDOW_R8) == 50, len(_DRIVER_WINDOW_R8)

# R9 WINDOW (round-8 verdict asks #1 and #2). Leads with ALL 31
# never-driver-checked entries — the r7h-r7l statistics family plus the
# six round-8 TPC-H closers — so the never-checked queue hits ZERO for
# the first time since r5. The remaining 19 slots are high-value
# re-checks: the three capstone flagships (the reference's own queries,
# last driver-checked r1-r3) and the entries hardened by the two r8
# random-corpus fuzz nets (window frames, rank stats, mode ties, the
# as-of pair, the Markov/event-sequence family — 13 real divergences
# fixed there; a driver re-check proves the fixes hold on clean data).
# The 8 rows-only entries (er_golden_records, dedup_minhash_lsh,
# dedup_simhash, similarity_lsh_topk, similarity_ivf_topk,
# dedup_resolve_clusters, multimodal_decode, multimodal_features) are
# deliberately EXCLUDED per verdict ask #2: each already has its
# once-only no_oracle record and a green hashable check_* twin, so this
# window can be a clean 50/50 with zero explainer rows.
#
# R10 ROTATION NOTE: after this round the never-checked queue is EMPTY
# (first time since r5) — every oracle-paired entry has at least one
# driver CORRECTNESS row. From r10 on, windows are pure re-checks;
# prioritize (a) entries whose only records predate the r3/r4 testdata
# regeneration (marked "(historical)" in COVERAGE.md's driver ledger),
# (b) entries FIXED since their last driver record — the r9 fuzz wave
# touched source_token_budget, pack_sequences, sample_stratified,
# curation_pipeline, quantile_norm_lengths, dup_passage_docs,
# nb_source_classifier, cond_compass_format, window_ntile_pctrank,
# embedding_quantize, welch_ttest, trimmed_mean_price,
# conformal_interval, lateral_topk (welch_ttest, trimmed_mean_price and
# conformal_interval were ALSO in this r9 window, so their r9 rows
# already prove the fixed forms; lateral_topk was NOT — its latest
# driver row (r8) predates the fix — and the others' latest rows also
# predate the fix and deserve a fresh row), and
# (c) the bench-timed heavies. Keep excluding the 8 rows-only entries.
_DRIVER_WINDOW_R9 = [
    # (a) the 31 never-checked, oldest registration first
    "ks_two_sample",
    "mann_whitney_u",
    "spearman_corr",
    "cohens_kappa",
    "calibration_curve",
    "pareto_skyline",
    "orders_acf",
    "cusum_drift",
    "weighted_median",
    "price_histogram",
    "events_burst_hours",
    "customer_active_streaks",
    "priority_mix_shift",
    "forecast_mase",
    "conversion_wilson_ci",
    "hierarchy_share",
    "roc_auc_eval",
    "ewma_control",
    "bloom_prefilter_join",
    "geo_grid_join",
    "bootstrap_ci_mean",
    "psi_price_drift",
    "target_encode_oof",
    "conformal_interval",
    "trimmed_mean_price",
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q11_important_share",
    "q12_priority_lateness",
    "q16_supplier_part_counts",
    "q20_volume_share_suppliers",
    # (b) the capstone flagships — the reference's own three queries
    "q1_avg_price_by_nation",
    "q2_count_by_nation_region",
    "q3_pct_of_total",
    # (c) fuzz-hardened re-checks: entries whose semantics the r8
    #     random-corpus nets exercised (and in several cases fixed)
    "window_running_sum",
    "window_lag_lead",
    "window_moving_avg",
    "window_value_functions",
    "agg_modes",
    "two_phase_quantiles",
    "orders_gini",
    "welch_ttest",
    "dedup_first_wins",
    "topk_per_group",
    "surrogate_ids",
    "agg_string_concat",
    "events_transition_matrix",
    "events_markov_stationary",
    "join_asof_events",
    "join_asof_tolerance",
]
assert len(_DRIVER_WINDOW_R9) == 50, len(_DRIVER_WINDOW_R9)

# R10 WINDOW (round-9 verdict ask #3). The never-checked queue is EMPTY,
# so this window is pure risk-ranked re-checks:
#   (a) the 14 entries FIXED in r9 whose latest driver rows predate the
#       fix (the r9 docs/dims/embeddings/combined fuzz waves touched
#       them; a fresh driver row proves each fix holds on clean data);
#   (b) the 11 oracle-paired entries whose latest driver row is r1-r3,
#       i.e. pre-testdata-regeneration (set_intersect, also an r2
#       registrant, already has an r7 row and is excluded);
#   (c) q1_pricing_summary post-oracle-cast-fix — the r9 red row. The
#       Spark side was bit-identical to DuckDB; the red hash was the
#       oracle's HUGEINT sum_qty rendering as float64 in the driver's
#       pandas hash. Fixed as CAST(_q AS BIGINT) in catalog_r8.py, and
#       the whole class is now gated by tests/test_oracle_dtypes.py
#       (no decimal128/hugeint output column in any oracle).
#   (d) the 13 entries FIXED DURING round 10 itself — the empty/all-NULL
#       net's 12 oracle-paired fixes (the similarity_ivf fix is driver-
#       visible through check_ivf_topk) plus rfm_segments, whose raw-
#       double average the first full-catalog sf0.1 differential caught;
#       "no entry's fix postdates its latest driver row" outranks heavy
#       re-checks;
#   (e) 11 bench-timed heavies (BENCH_r09 descending, preferring r5-era
#       driver rows), skipping entries with green r9 rows. The heavies
#       displaced by (d) — q21_sole_late_supplier, knn_graph_radius,
#       q18_large_orders (r8 rows), skew_salted_join, pagerank_event_
#       graph, semdedup_prune, dsir_importance, kl_source_drift,
#       sketch_cms_topk, exact_substr_spans (r7), decontaminate (r6),
#       dedup_exact, events_hourly (r5) — are the natural r11 window.
# The 8 rows-only entries stay excluded (once-only no_oracle records +
# green hashable check_* twins), keeping the window a clean 50/50.
_DRIVER_WINDOW_R10 = [
    # (c) the r9 red row, post-fix — lead with it
    "q1_pricing_summary",
    # (a) fixed in r9, latest driver row predates the fix
    "source_token_budget",
    "pack_sequences",
    "sample_stratified",
    "curation_pipeline",
    "quantile_norm_lengths",
    "dup_passage_docs",
    "nb_source_classifier",
    "cond_compass_format",
    "window_ntile_pctrank",
    "embedding_quantize",
    "lateral_topk",
    "funnel_time_to_convert",
    "q8_market_share",
    "q14_promo_revenue",
    # (b) latest driver row r1-r3 (pre-testdata-regeneration)
    "proj_filter",
    "derived_cast_round",
    "string_split",
    "date_parts",
    "sas_date_convert",
    "join_left_counts",
    "join_semi",
    "join_anti",
    "agg_distinct",
    "set_union",
    "set_except",
    # (d) fixed during round 10 — empty/all-NULL net + sf0.1 differential
    "agg_cube",
    "agg_rollup",
    "agg_grouping_sets",
    "agg_approx",
    "events_markov_stationary",
    "priority_mix_shift",
    "shard_balance",
    "sketch_hll_union",
    "logreg_gd_weights",
    "zipf_fit",
    "split_no_leakage",
    "check_ivf_topk",
    "rfm_segments",
    # (e) bench heavies, BENCH_r09 time desc, no green-r9 repeats
    "dbscan_customers",
    "graph_triangles",
    "simjoin_prefix",
    "dedup_embedding_cosine",
    "dedup_jaccard_pairs",
    "join_multiway_revenue",
    "bm25_scores",
    "token_bigram_pmi",
    "similarity_topk",
    "events_sessionize",
    "agg_stats_summary",
]
assert len(_DRIVER_WINDOW_R10) == 50, len(_DRIVER_WINDOW_R10)

# Round-11 driver window — staleness-rotated per the r10 verdict ask #4,
# with this round's touched entries outranking everything ("no entry
# whose latest fix postdates its latest driver row"):
#   (a) the 5 entries FIXED/CHANGED in r11: dup_passage_docs (the alldup
#       duplicate-id fix — r10's one red test), join_asof_events /
#       join_asof_tolerance (the mixdup corpus found the same identity
#       class), split_no_leakage (all_docs_assigned →
#       n_coverage_violations output change), agg_stats_funcs (oracle
#       NULLIF guard; also the oldest-green stats entry, r6);
#   (b) the 8 entries DE-HINTED in r11 (forced broadcast(customer)
#       dropped; results proven invariant locally, a fresh driver row
#       closes the loop): q1/q2 flagship (q3 is the t1 smoke every
#       round), join_multiway_revenue, topk_per_group, q18_large_orders,
#       target_encode_oof, conformal_interval, trimmed_mean_price;
#   (c) welch_ttest — named by the r10 verdict as touched-in-r10 with an
#       r9 row. Ordering for the OTHER named entries was verified
#       against CORRECTNESS_r10: rfm_segments / agg_stats_summary /
#       priority_mix_shift rows were recorded by the end-of-round driver
#       AFTER the snapshot commit containing their fixes, so their r10
#       rows already postdate the fixes — no repeat needed;
#   (d) the oldest-green tail: all 26 remaining r5-row entries, then 10
#       r6-row entries (alphabetical; includes the r6 check_* twins the
#       verdict called out).
# The 8 rows-only entries stay excluded (once-only no_oracle records +
# green hashable check_* twins), keeping the window a clean 50/50.
_DRIVER_WINDOW_R11 = [
    # (a) r11 fixes — lead with the round's red-test fix
    "dup_passage_docs",
    "join_asof_events",
    "join_asof_tolerance",
    "split_no_leakage",
    "agg_stats_funcs",
    # (b) r11 de-hinted
    "q1_avg_price_by_nation",
    "q2_count_by_nation_region",
    "join_multiway_revenue",
    "topk_per_group",
    "q18_large_orders",
    "target_encode_oof",
    "conformal_interval",
    "trimmed_mean_price",
    # (c)
    "welch_ttest",
    # (d) r5-row tail, alphabetical
    "agg_distinct_count",
    "agg_percentiles",
    "agg_pivot",
    "date_arithmetic",
    "dedup_exact",
    "dedup_incremental",
    "doc_fingerprint",
    "doc_length_percentiles",
    "events_hourly",
    "events_json",
    "events_json_struct",
    "events_multires_rollup",
    "gapfill_resample",
    "join_range_bucketed",
    "merge_scd2",
    "quality_curriculum",
    "sample_hash_quota",
    "skew_salted_agg",
    "string_functions",
    "string_regexp",
    "text_bpe_count",
    "text_dedup_tokens",
    "text_lang_id",
    "text_quality",
    "text_token_stats",
    "unpivot_part",
    # (d) r6-row tail, alphabetical
    "agg_boolean_funcs",
    "agg_conditional",
    "agg_distinct_twophase",
    "ansi_safe_casts",
    "array_explode_agg",
    "array_higher_order",
    "cdc_apply_changes",
    "check_cluster_consistency",
    "check_lsh_topk",
    "check_minhash_containment",
]
assert len(_DRIVER_WINDOW_R11) == 50, len(_DRIVER_WINDOW_R11)

# Round-12 driver window — staleness-rotated per the r11 verdict ask #3,
# leading with the entries CHANGED this round ("no entry whose latest fix
# postdates its latest driver row"):
#   (a) the 7 entries DE-HINTED in r12 (the part-side / SF-scaling-side
#       forced-broadcast sweep: basket_lift dropped broadcast(part);
#       q17/q19 dropped the brand-filtered part-fraction hints;
#       large_order_customers dropped broadcast(HAVING-filtered order
#       keys); decontaminate dropped broadcast(src0 gram set);
#       decontaminate_embedding dropped broadcast(vec_id%37 bench);
#       join_range_buckets dropped broadcast(sampled intervals) — all
#       results proven invariant locally; fresh driver rows close the
#       loop);
#   (a2) the 4 oracle-paired entries whose CODE PATH changed later in
#       r12 (the connected_components edge-materialization fix and its
#       consumers, the DBSCAN lazy lineage cuts, the pagerank edge
#       checkpoint): pagerank_event_graph, dbscan_customers,
#       check_dbscan_fixpoint, check_er_mass — the clusters.py twins
#       check_cluster_consistency / check_minhash_containment /
#       split_no_leakage and dup_graph_degree are already in (a)/(b);
#       the remaining CC consumers are rows-only (dedup_minhash_lsh,
#       dedup_resolve_clusters, er_golden_records); plus
#       kmeans_embeddings, whose inertia readout moved to an exact
#       integer micro-unit fold after the r12 sf0.1 sweep caught the
#       raw double sum landing on a 4dp half boundary;
#   (b) the 26 remaining entries whose latest green driver row is r6
#       (the verdict's staleness list minus the two already in (a));
#   The r7-row tail fully yielded its slots to (a2)/(a3): the (a3)
#       sweep itself covers four r7-stale entries (dsir_importance,
#       kl_source_drift, perplexity_score, skew_salted_join); the rest
#       of the r7 tail (abc_classification, agg_having, agg_robust_mad,
#       boilerplate_windows, bpe_merge_pairs, churn_feature_lift,
#       dedup_soft_weights, embedding_norm_outliers,
#       events_anomaly_zscore, events_funnel, events_retention_cohorts,
#       events_session_window, events_time_decay, exact_substr_spans,
#       funnel_strict_sequence) plus nb_source_classifier (changed in
#       (a3) but displaced — one slot short) lead the r13 rotation.
# The 8 rows-only entries stay excluded (once-only no_oracle records +
# green hashable check_* twins), keeping the window a clean 50/50.
_DRIVER_WINDOW_R12 = [
    # (a) r12 de-hinted
    "basket_lift",
    "q17_small_qty_revenue",
    "q19_disjunctive_join",
    "large_order_customers",
    "decontaminate",
    "decontaminate_embedding",
    "join_range_buckets",
    # (a2) r12 code-path changes (CC edge materialization, DBSCAN lazy
    # cuts, pagerank edge checkpoint)
    "pagerank_event_graph",
    "dbscan_customers",
    "check_dbscan_fixpoint",
    "check_er_mass",
    "kmeans_embeddings",
    # (a3) the r12 fold-discipline hardening sweep (raw double sums at
    # rounding boundaries → exact integer / nano-quantized folds, the
    # kmeans incident's class closed repo-wide)
    "skew_salted_agg",
    "events_multires_rollup",
    "check_lsh_topk",
    "check_ivf_topk",
    "kl_source_drift",
    "chi_square_independence",
    "skew_salted_join",
    "quality_curriculum",
    "embedding_quantize",
    "dsir_importance",
    "perplexity_score",
    "psi_price_drift",
    # (b) r6-row staleness tail, alphabetical
    "check_multimodal",
    "check_simhash_invariants",
    "chunk_documents",
    "clip_outliers",
    "dup_graph_degree",
    "embedding_centroids",
    "events_gap_stats",
    "fuzzy_name_pairs",
    "join_null_safe",
    "mix_weights",
    "ngram_counts",
    "pii_redact",
    "posexplode_tokens",
    "profile_columns",
    "recursive_month_spine",
    "source_dup_matrix",
    "split_assign",
    "subquery_correlated_avg",
    "text_char_entropy",
    "text_dup_bigrams",
    "text_gopher_filters",
    "tfidf_top_terms",
    "token_histogram",
    "union_schema_evolution",
    "vocab_coverage",
    "window_range_frame",
]
assert len(_DRIVER_WINDOW_R12) == 50, len(_DRIVER_WINDOW_R12)

# Round-13 driver window — changed-first, then staleness (r12 verdict
# ask #2):
#   (a) the 2 entries rewritten in r12 AFTER that round's window filled,
#       so their latest fix postdates their latest driver row:
#       agg_correlation (exact-integer-sums correlation rewrite, latest
#       row r8) and nb_source_classifier (fold hardening, latest row
#       r10);
#   (b) the entries changed by THIS round's work: the broadcast de-hint
#       sweep (verdict ask #1: bloom_prefilter_join's customer key-panel
#       hint; split_no_leakage's component-map hint in
#       _split_assignments — split_assign itself is the map-only
#       content-addressed split, unchanged, kept here because the
#       verdict asked for its fresh row) and the r13 eval-census
#       materialize fixes + lineage
#       refactor (check_er_mass via _er_clusters' pair materialization;
#       check_minhash_containment, check_cluster_consistency,
#       dup_graph_degree via _minhash_components' pair materialization;
#       check_simhash_invariants' sim/high materialization;
#       pagerank_event_graph via operators/graph.py's materialize()
#       cut path — rows-only consumers er_golden_records /
#       dedup_minhash_lsh / dedup_resolve_clusters stay excluded);
#   (c) the full r7-row staleness tail (29 entries, alphabetical — all
#       fit);
#   (d) r8-row entries alphabetical to fill 50 (agg_correlation already
#       in (a)).
# The 8 rows-only entries stay excluded (once-only no_oracle records +
# green hashable check_* twins), keeping the window a clean 50/50.
_DRIVER_WINDOW_R13 = [
    # (a) r12 late rewrites
    "agg_correlation",
    "nb_source_classifier",
    # (b) r13 de-hinted + eval-census materialize fixes
    "bloom_prefilter_join",
    "split_assign",
    "split_no_leakage",
    "check_er_mass",
    "check_minhash_containment",
    "check_cluster_consistency",
    "check_simhash_invariants",
    "dup_graph_degree",
    "pagerank_event_graph",
    # (c) r7-row staleness tail, alphabetical
    "abc_classification",
    "agg_having",
    "agg_robust_mad",
    "boilerplate_windows",
    "bpe_merge_pairs",
    "churn_feature_lift",
    "dedup_soft_weights",
    "embedding_norm_outliers",
    "events_anomaly_zscore",
    "events_funnel",
    "events_retention_cohorts",
    "events_session_window",
    "events_time_decay",
    "exact_substr_spans",
    "funnel_strict_sequence",
    "langid_confusion",
    "orders_cohort_ltv",
    "q10_returned_items",
    "q15_top_supplier",
    "q5_local_volume",
    "rolling_distinct_users",
    "semdedup_prune",
    "session_bounce_rate",
    "set_intersect",
    "sketch_cms_topk",
    "skew_profile",
    "subquery_scalar_avg",
    "survival_signup_purchase",
    "text_readability",
    # (d) r8-row staleness, alphabetical fill
    "ab_test_analysis",
    "benford_digit_test",
    "check_pixel_parity",
    "check_png_pixels",
    "check_wav_samples",
    "churn_labels",
    "event_paths",
    "events_json_variant",
    "events_seasonality",
    "graph_core_peel",
]
assert len(_DRIVER_WINDOW_R13) == 50, len(_DRIVER_WINDOW_R13)

# Round-14 driver window — changed-first, then staleness (r13 verdict
# ask #2):
#   (a) the entries whose CODE PATH changed this round: the
#       lineage.materialize adoption for the catalog-local iterative
#       loops (r13's queued follow-up) — the DBSCAN grid-CC family in
#       catalog_r7i (dbscan_customers, check_dbscan_fixpoint,
#       knn_graph_radius — shared _points/_directed_pairs cuts), the
#       graph_core_peel fixpoint in catalog_r6h, and
#       recursive_reachability's edge cut in catalog_r7l. All are
#       behavior-identical without a checkpoint dir (materialize falls
#       back to the same localCheckpoint) — fresh rows close the loop
#       the same way r13's de-hints did. dup_graph_degree (named in the
#       ask) is NOT re-listed: it consumes _minhash_components, whose
#       code did not change this round, and it holds a fresh green r13
#       row.
#   (a2) the two entries whose memo/loop-invariant cuts were swapped
#       onto materialize LATE in r14 (the policy-closure sweep found
#       them after the window was first built): pagerank_event_graph
#       (catalog_r6e edge cut) and check_simhash_invariants
#       (_simhash_sig memo cut) — slotted in so no entry's latest fix
#       postdates its latest driver row;
#   (b) the full r8-row staleness tail (22 entries; knn_graph_radius
#       and recursive_reachability are already in (a), so 20 here,
#       alphabetical);
#   (c) r9-row entries, alphabetical fill to 50 (23 of the 36 — the
#       13 left out are the freshest-named alphabetical tail and lead
#       the r15 rotation).
# The 8 rows-only entries stay excluded (once-only no_oracle records +
# green hashable check_* twins), keeping the window a clean 50/50.
_DRIVER_WINDOW_R14 = [
    # (a) r14 lineage.materialize adoption (catalog-local loops)
    "dbscan_customers",
    "check_dbscan_fixpoint",
    "knn_graph_radius",
    "recursive_reachability",
    "graph_core_peel",
    # (a2) late r14 cut swaps (policy closure)
    "pagerank_event_graph",
    "check_simhash_invariants",
    # (b) r8-row staleness tail, alphabetical
    "info_gain_terms",
    "join_attribution_window",
    "linreg_by_group",
    "ndcg_label_eval",
    "pit_features",
    "q13_order_histogram",
    "q21_sole_late_supplier",
    "q22_dormant_customers",
    "q3_unshipped_topk",
    "q4_late_exists",
    "q6_forecast_delta",
    "q7_nation_volume",
    "q9_profit_proxy",
    "revenue_pareto",
    "ri_audit",
    "rrf_fusion",
    "sample_universe",
    "sample_weighted",
    "table_fingerprints",
    "user_activity_features",
    # (c) r9-row staleness, alphabetical fill
    "agg_modes",
    "agg_string_concat",
    "bootstrap_ci_mean",
    "calibration_curve",
    "cohens_kappa",
    "conversion_wilson_ci",
    "customer_active_streaks",
    "cusum_drift",
    "dedup_first_wins",
    "events_burst_hours",
    "events_transition_matrix",
    "ewma_control",
    "forecast_mase",
    "geo_grid_join",
    "hierarchy_share",
    "ks_two_sample",
    "mann_whitney_u",
    "orders_acf",
    "orders_gini",
    "pareto_skyline",
    "price_histogram",
    "q11_important_share",
    "q12_priority_lateness",
]
assert len(_DRIVER_WINDOW_R14) == 50, len(_DRIVER_WINDOW_R14)

# Round-15 driver window — changed-first, then staleness (r14 verdict
# ask #1):
#   (a) the entries whose CODE PATH changed this round: the
#       lineage.materialize reliable-path eager force (advisor r14 —
#       a lazy reliable checkpoint pays the classic 2x doCheckpoint
#       recompute and, under checkpointAllMarkedAncestors=false, drops
#       all but the nearest mark of a cadence chain). The eager=False
#       call sites are _simhash_sig's session memo (consumers:
#       check_simhash_invariants; dedup_simhash is rows-only and stays
#       out of the window by design) and catalog_r7i's in-loop label
#       cadence cuts (consumers: dbscan_customers,
#       check_dbscan_fixpoint). Behavior-identical without a
#       checkpoint dir (the driver's configuration) — fresh rows close
#       the loop the same way r14's materialize-adoption leads did.
#   (b) the 13 deferred r9-row entries (the freshest-named alphabetical
#       tail r14 left out, explicitly queued to lead this round);
#   (c) r10-row staleness, alphabetical fill to 50 (34 of the 43; the
#       9 left out are the freshest-named alphabetical tail and lead
#       the r16 rotation: shard_balance, similarity_topk,
#       simjoin_prefix, sketch_hll_union, source_token_budget,
#       string_split, token_bigram_pmi, window_ntile_pctrank,
#       zipf_fit).
# The 8 rows-only entries stay excluded (once-only no_oracle records +
# green hashable check_* twins), keeping the window a clean 50/50.
_DRIVER_WINDOW_R15 = [
    # (a) r15 reliable-path eager force (lazy-cut consumers)
    "dbscan_customers",
    "check_dbscan_fixpoint",
    "check_simhash_invariants",
    # (b) deferred r9-row tail, alphabetical
    "q16_supplier_part_counts",
    "q20_volume_share_suppliers",
    "q2_min_cost_supplier",
    "q3_pct_of_total",
    "roc_auc_eval",
    "spearman_corr",
    "surrogate_ids",
    "two_phase_quantiles",
    "weighted_median",
    "window_lag_lead",
    "window_moving_avg",
    "window_running_sum",
    "window_value_functions",
    # (c) r10-row staleness, alphabetical fill
    "agg_approx",
    "agg_cube",
    "agg_distinct",
    "agg_grouping_sets",
    "agg_rollup",
    "agg_stats_summary",
    "bm25_scores",
    "cond_compass_format",
    "curation_pipeline",
    "date_parts",
    "dedup_embedding_cosine",
    "dedup_jaccard_pairs",
    "derived_cast_round",
    "events_markov_stationary",
    "events_sessionize",
    "funnel_time_to_convert",
    "graph_triangles",
    "join_anti",
    "join_left_counts",
    "join_semi",
    "lateral_topk",
    "logreg_gd_weights",
    "pack_sequences",
    "priority_mix_shift",
    "proj_filter",
    "q14_promo_revenue",
    "q1_pricing_summary",
    "q8_market_share",
    "quantile_norm_lengths",
    "rfm_segments",
    "sample_stratified",
    "sas_date_convert",
    "set_except",
    "set_union",
]
assert len(_DRIVER_WINDOW_R15) == 50, len(_DRIVER_WINDOW_R15)

# Round-16 driver window — pure staleness rotation (r15 verdict asks #2
# and #3). No catalog entry's code path changed this round (the r16
# source delta is bench-capture protocol + test-scanner hygiene), so
# there are no changed-first leads; the window is:
#   (a) the 9 deferred r10-row entries (the alphabetical tail r15 left
#       out, explicitly queued to lead this rotation);
#   (b) the 9 stale check_* twins (driver rows r12-r13) — the hashable
#       oracle halves of the rows-only families, rotated in ahead of
#       alphabetical filler (ask #3) so every check_* entry has a row
#       <= 2 rounds old after r16 (check_dbscan_fixpoint and
#       check_simhash_invariants are r15-fresh and stay out);
#   (c) r11-row staleness, alphabetical fill to 50 (32 of the 43; the
#       11 left out are the freshest-named alphabetical tail and lead
#       the r17 rotation: string_regexp, target_encode_oof,
#       text_bpe_count, text_dedup_tokens, text_lang_id, text_quality,
#       text_token_stats, topk_per_group, trimmed_mean_price,
#       unpivot_part, welch_ttest).
# The 8 rows-only entries stay excluded (once-only no_oracle records +
# green hashable check_* twins), keeping the window a clean 50/50.
_DRIVER_WINDOW_R16 = [
    # (a) deferred r10-row tail, alphabetical
    "shard_balance",
    "similarity_topk",
    "simjoin_prefix",
    "sketch_hll_union",
    "source_token_budget",
    "string_split",
    "token_bigram_pmi",
    "window_ntile_pctrank",
    "zipf_fit",
    # (b) stale check_* twins: r12 rows first, then r13, alphabetical
    "check_ivf_topk",
    "check_lsh_topk",
    "check_multimodal",
    "check_cluster_consistency",
    "check_er_mass",
    "check_minhash_containment",
    "check_pixel_parity",
    "check_png_pixels",
    "check_wav_samples",
    # (c) r11-row staleness, alphabetical fill
    "agg_boolean_funcs",
    "agg_conditional",
    "agg_distinct_count",
    "agg_distinct_twophase",
    "agg_percentiles",
    "agg_pivot",
    "agg_stats_funcs",
    "ansi_safe_casts",
    "array_explode_agg",
    "array_higher_order",
    "cdc_apply_changes",
    "conformal_interval",
    "date_arithmetic",
    "dedup_exact",
    "dedup_incremental",
    "doc_fingerprint",
    "doc_length_percentiles",
    "dup_passage_docs",
    "events_hourly",
    "events_json",
    "events_json_struct",
    "gapfill_resample",
    "join_asof_events",
    "join_asof_tolerance",
    "join_multiway_revenue",
    "join_range_bucketed",
    "merge_scd2",
    "q18_large_orders",
    "q1_avg_price_by_nation",
    "q2_count_by_nation_region",
    "sample_hash_quota",
    "string_functions",
]
assert len(_DRIVER_WINDOW_R16) == 50, len(_DRIVER_WINDOW_R16)

# Round-17 driver window — staleness rotation + the rows-only refresh
# (r16 verdict asks #1 and #2). No catalog entry's code path changed
# this round (the r17 source delta is bench rounding hygiene + test
# pins), so there are no changed-first leads; the window is:
#   (a) the 11-entry r11-row alphabetical tail explicitly queued by the
#       r16 rotation (string_regexp .. welch_ttest) — the oldest
#       oracle-paired rows in the ledger;
#   (b) the 8 rows-only (no_oracle) entries (ask #2): their only driver
#       rows date from r03-r08, BEFORE the r3/r4 testdata regeneration,
#       so the raw CORRECTNESS union shows them stale even though their
#       hashable check_* twins were all re-proven green in r16. Slotting
#       them here gives each a rows-recorded row on the CURRENT data
#       generation and closes the last ledger ambiguity. These slots
#       are rows-only by design (the driver records a weaker check);
#       tests/test_driver_window.py carves an explicit allowance.
#   (c) r12-row staleness, alphabetical fill to 50 (31 of the 40; the
#       9 left out are the alphabetical tail and lead the r18 rotation:
#       subquery_correlated_avg, text_char_entropy, text_dup_bigrams,
#       text_gopher_filters, tfidf_top_terms, token_histogram,
#       union_schema_evolution, vocab_coverage, window_range_frame).
_DRIVER_WINDOW_R17 = [
    # (a) r11-row tail, alphabetical
    "string_regexp",
    "target_encode_oof",
    "text_bpe_count",
    "text_dedup_tokens",
    "text_lang_id",
    "text_quality",
    "text_token_stats",
    "topk_per_group",
    "trimmed_mean_price",
    "unpivot_part",
    "welch_ttest",
    # (b) rows-only refresh (post-regeneration driver rows), alphabetical
    "dedup_minhash_lsh",
    "dedup_resolve_clusters",
    "dedup_simhash",
    "er_golden_records",
    "multimodal_decode",
    "multimodal_features",
    "similarity_ivf_topk",
    "similarity_lsh_topk",
    # (c) r12-row staleness, alphabetical fill
    "basket_lift",
    "chi_square_independence",
    "chunk_documents",
    "clip_outliers",
    "decontaminate",
    "decontaminate_embedding",
    "dsir_importance",
    "embedding_centroids",
    "embedding_quantize",
    "events_gap_stats",
    "events_multires_rollup",
    "fuzzy_name_pairs",
    "join_null_safe",
    "join_range_buckets",
    "kl_source_drift",
    "kmeans_embeddings",
    "large_order_customers",
    "mix_weights",
    "ngram_counts",
    "perplexity_score",
    "pii_redact",
    "posexplode_tokens",
    "profile_columns",
    "psi_price_drift",
    "q17_small_qty_revenue",
    "q19_disjunctive_join",
    "quality_curriculum",
    "recursive_month_spine",
    "skew_salted_agg",
    "skew_salted_join",
    "source_dup_matrix",
]
assert len(_DRIVER_WINDOW_R17) == 50, len(_DRIVER_WINDOW_R17)

# Round-18 driver window — pure staleness rotation (r17 verdict ask #1).
# No catalog entry's code path changed this round (the r18 source delta
# is the bench loadavg-gate hardening + test pins, neither of which
# touches any entry's execution), so there are no changed-first leads
# and no rows-only slots remain to refresh (the 8 no_oracle entries got
# their post-regeneration rows in r17; ROWS_ONLY_REFRESH in
# tests/test_driver_window.py is emptied this round). The window is:
#   (a) the 9-entry r12-row alphabetical tail explicitly queued by the
#       r17 rotation (subquery_correlated_avg .. window_range_frame) —
#       the oldest oracle-paired rows in the ledger;
#   (b) the full 41-entry r13-row cohort, alphabetical — 9 + 41 = 50
#       exactly, so this rotation consumes the r13 staleness layer
#       whole; after it the oldest remaining rows are the r14 cohort
#       (47 entries), which leads the r19 rotation (alphabetical
#       fill: agg_modes .. user_activity_features, 47 of 47 fit with
#       3 slots left for the r15 head: agg_approx, agg_cube,
#       agg_distinct).
_DRIVER_WINDOW_R18 = [
    # (a) r12-row tail, alphabetical
    "subquery_correlated_avg",
    "text_char_entropy",
    "text_dup_bigrams",
    "text_gopher_filters",
    "tfidf_top_terms",
    "token_histogram",
    "union_schema_evolution",
    "vocab_coverage",
    "window_range_frame",
    # (b) r13-row cohort, alphabetical (all 41)
    "ab_test_analysis",
    "abc_classification",
    "agg_correlation",
    "agg_having",
    "agg_robust_mad",
    "benford_digit_test",
    "bloom_prefilter_join",
    "boilerplate_windows",
    "bpe_merge_pairs",
    "churn_feature_lift",
    "churn_labels",
    "dedup_soft_weights",
    "dup_graph_degree",
    "embedding_norm_outliers",
    "event_paths",
    "events_anomaly_zscore",
    "events_funnel",
    "events_json_variant",
    "events_retention_cohorts",
    "events_seasonality",
    "events_session_window",
    "events_time_decay",
    "exact_substr_spans",
    "funnel_strict_sequence",
    "langid_confusion",
    "nb_source_classifier",
    "orders_cohort_ltv",
    "q10_returned_items",
    "q15_top_supplier",
    "q5_local_volume",
    "rolling_distinct_users",
    "semdedup_prune",
    "session_bounce_rate",
    "set_intersect",
    "sketch_cms_topk",
    "skew_profile",
    "split_assign",
    "split_no_leakage",
    "subquery_scalar_avg",
    "survival_signup_purchase",
    "text_readability",
]
assert len(_DRIVER_WINDOW_R18) == 50, len(_DRIVER_WINDOW_R18)
CATALOG = {
    name: CATALOG[name]
    for name in (
        *_DRIVER_WINDOW_R18,
        *(k for k in CATALOG if k not in set(_DRIVER_WINDOW_R18)),
    )
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: e.spark_fn for name, e in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {name: e.sql for name, e in CATALOG.items() if e.sql is not None}
