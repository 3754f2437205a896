"""Round-7h catalog entries — spatial blocking, the distributed
bootstrap, and distribution-stability monitoring:

- ``geo_grid_join``: grid-blocked proximity self-join — the spatial
  analog of LSH blocking. Synthetic integer coordinates on a 1000×1000
  grid are content-addressed from the customer key (two md5 slices, the
  engine convention), cells are radius-sized (25), and each point
  probes its 3×3 cell neighborhood, which provably covers every pair
  within the radius. The verify step is PURE INTEGER: dx²+dy² ≤ r² as
  BIGINT, so candidate and match counts are exact on both engines. At
  100 TB this is the shape of every spatial join: one shuffle on the
  cell key, in-cell work bounded by density, never corpus-quadratic.
- ``bootstrap_ci_mean``: Poisson bootstrap of the mean order price —
  THE distributed bootstrap (each row draws its per-resample
  multiplicity independently, so no resample ever needs a global
  sample-with-replacement pass). Multiplicities are DETERMINISTIC:
  md5(orderkey, b) mod 2^20 inverted through the Poisson(1) CDF via
  fixed integer thresholds (floor(CDF·2^20) literals below), so both
  engines draw the identical multiplicity for every (row, resample).
  Each resample's sum/count are exact BIGINTs (price in cents); the
  percentile CI picks nearest-rank means out of B=100 — a 100-row
  sort, not a data sort.
- ``psi_price_drift``: month-over-month Population Stability Index of
  the order-price distribution over fixed integer-edge bins with
  add-one smoothing (PSI = Σ (p−q)·ln(p/q); < 0.1 stable, > 0.25
  action). Bin counts are exact integers; ln follows the
  ``kl_source_drift`` precedent (identical per-term math, 4-decimal
  IEEE rounding on the readout).

Same contract as ``plans.catalog``: every entry is a PySpark plan paired
with DuckDB oracle SQL over the identical parquet, column names aliased
identically, floats rounded through the shared IEEE helper."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from .catalog import Entry, sql_ieee_round, t

# ---------------------------------------------------------------------------
# 1. Grid-blocked proximity join (integer geometry)
# ---------------------------------------------------------------------------

_GRID = 1000  # coordinate space is _GRID × _GRID
_RADIUS = 25  # proximity radius == cell size -> 3×3 neighborhood covers


def _coords(key):
    """Content-addressed integer coordinates from two md5 slices."""
    h = F.md5(key.cast("string"))
    x = F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % _GRID
    y = F.conv(F.substring(h, 16, 15), 16, 10).cast("long") % _GRID
    return x, y


def geo_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row proximity ledger: points, candidate pairs emitted by the
    3×3 cell probe, exact in-radius pairs, and the exact BIGINT sum of
    squared distances over matches (the determinism handle — any
    coordinate or blocking bug changes it). Each unordered pair is
    counted once: the left side explodes to its 9 neighbor cells, the
    right side sits in its single home cell, and key_a < key_b kills
    the mirror."""
    x, y = _coords(F.col("c_custkey"))
    # NULL custkey: no synthetic position — excluded on both sides
    # (the oracle's '0x'||NULL cast would crash). Degenerate-customer net.
    pts = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey").isNotNull())
        .select(F.col("c_custkey").alias("k"), x.alias("x"), y.alias("y"))
        .withColumn("cx", (F.col("x") / _RADIUS).cast("long"))
        .withColumn("cy", (F.col("y") / _RADIUS).cast("long"))
    )
    pts = pts.localCheckpoint()  # probe + home sides
    off = F.explode(
        F.array(*[F.lit(i) for i in (-1, 0, 1)])
    )
    probe = (
        pts.select("k", "x", "y", "cx", "cy")
        .withColumn("dx", off)
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            F.col("k").alias("ka"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
        )
    )
    cand = probe.join(
        pts.select(
            F.col("k").alias("kb"),
            F.col("x").alias("xb"),
            F.col("y").alias("yb"),
            "cx",
            "cy",
        ),
        ["cx", "cy"],
    ).filter(F.col("ka") < F.col("kb"))
    d2 = (F.col("xa") - F.col("xb")) ** 2 + (F.col("ya") - F.col("yb")) ** 2
    cand = cand.withColumn("d2", d2.cast("long"))
    hits = cand.filter(F.col("d2") <= _RADIUS * _RADIUS)
    return (
        pts.agg(F.count("*").alias("n_points"))
        .crossJoin(cand.agg(F.count("*").alias("n_candidate_pairs")))
        .crossJoin(
            hits.agg(
                F.count("*").alias("n_within_radius"),
                F.coalesce(F.sum("d2"), F.lit(0))
                .cast("long")
                .alias("sum_d2"),
            )
        )
        .select(
            F.col("n_points").cast("long").alias("n_points"),
            F.col("n_candidate_pairs")
            .cast("long")
            .alias("n_candidate_pairs"),
            F.col("n_within_radius").cast("long").alias("n_within_radius"),
            "sum_d2",
        )
    )


GEO_GRID_JOIN_SQL = f"""
WITH pts AS (
    SELECT c_custkey AS k,
           CAST(concat('0x', substring(md5(CAST(c_custkey AS VARCHAR)),
                1, 15)) AS BIGINT) % {_GRID} AS x,
           CAST(concat('0x', substring(md5(CAST(c_custkey AS VARCHAR)),
                16, 15)) AS BIGINT) % {_GRID} AS y
    FROM customer
    WHERE c_custkey IS NOT NULL
),
cells AS (
    SELECT k, x, y, x // {_RADIUS} AS cx, y // {_RADIUS} AS cy FROM pts
),
cand AS (
    SELECT a.k AS ka, b.k AS kb,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
    FROM cells a
    JOIN (VALUES (-1), (0), (1)) dx(v) ON true
    JOIN (VALUES (-1), (0), (1)) dy(v) ON true
    JOIN cells b ON b.cx = a.cx + dx.v AND b.cy = a.cy + dy.v
    WHERE a.k < b.k
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM pts) AS n_points,
       CAST(count(*) AS BIGINT) AS n_candidate_pairs,
       CAST(coalesce(sum(CASE WHEN d2 <= {_RADIUS * _RADIUS}
                         THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_within_radius,
       CAST(coalesce(sum(CASE WHEN d2 <= {_RADIUS * _RADIUS} THEN d2 END),
            0) AS BIGINT) AS sum_d2
FROM cand
"""


# ---------------------------------------------------------------------------
# 2. Deterministic Poisson bootstrap CI of the mean
# ---------------------------------------------------------------------------

_B = 100  # resamples
# floor(CDF_Poisson(1)(k) * 2^20) for k = 0..6; u >= last -> multiplicity 7
_POIS_T = (385749, 771499, 964373, 1028665, 1044738, 1047952, 1048488)


def _multiplicity(u):
    """Poisson(1) multiplicity from a uniform 20-bit integer via fixed
    thresholds — identical integer comparisons on both engines."""
    m = F.lit(7)
    for k in range(len(_POIS_T) - 1, -1, -1):
        m = F.when(u < _POIS_T[k], k).otherwise(m)
    return m


def bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row bootstrap ledger: the observed mean order price and its
    95% percentile CI from B=100 Poisson resamples. Every resample's
    numerator/denominator is an exact BIGINT (cents × multiplicity), so
    the B means are identical doubles cross-engine; the CI is
    nearest-rank (means sorted ascending, ranks 3 and 98 of 100).

    Scale: the B-fold explode is map-side combined into B partial sums
    per partition — one shuffle of B×partitions tiny rows; no resample
    ever re-reads or re-shuffles the data."""
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    # a deterministic resample draws multiplicities from md5(orderkey):
    # a NULL key has no reproducible identity (and concat_ws vs concat
    # hash different strings for it) — excluded on both sides.
    rows = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey").isNotNull())
        .select(F.col("o_orderkey").alias("k"), cents.alias("c"))
    )
    b = F.explode(F.sequence(F.lit(0), F.lit(_B - 1))).alias("b")
    drawn = rows.select("k", "c", b)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("_", F.col("k"), F.col("b"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % 1048576
    )
    drawn = drawn.withColumn("m", _multiplicity(u))
    # a resample whose multiplicities all drew 0 has no mean — excluded
    # on both engines (tiny-corpus limit: with ONE order, ~37 of the 100
    # Poisson resamples are empty and s/n is an ANSI divide-by-zero;
    # statistically impossible at any real scale, so a clean-data no-op)
    per_b = drawn.groupBy("b").agg(
        F.sum(F.col("m") * F.col("c")).alias("s"),
        F.sum("m").alias("n"),
    ).filter(F.col("n") > 0)
    mean_b = per_b.select(
        (F.col("s") / F.col("n") / 100.0).alias("mu")
    )
    w = Window.orderBy("mu")
    ranked = mean_b.withColumn("r", F.row_number().over(w))
    ci = ranked.agg(
        F.min(F.when(F.col("r") == 3, F.col("mu"))).alias("lo"),
        F.min(F.when(F.col("r") == 98, F.col("mu"))).alias("hi"),
    )
    base = rows.agg(
        F.count("*").alias("n_rows"),
        (F.sum("c") / F.count("*") / 100.0).alias("mean_obs"),
    )
    return base.crossJoin(ci).select(
        F.col("n_rows").cast("long").alias("n_rows"),
        F.lit(_B).cast("long").alias("n_resamples"),
        ieee_round(F.col("mean_obs"), 4).alias("mean_price"),
        ieee_round(F.col("lo"), 4).alias("ci_lo"),
        ieee_round(F.col("hi"), 4).alias("ci_hi"),
    )


_POIS_CASE = (
    "CASE "
    + " ".join(
        f"WHEN u < {thr} THEN {k}" for k, thr in enumerate(_POIS_T)
    )
    + " ELSE 7 END"
)

BOOTSTRAP_CI_MEAN_SQL = f"""
WITH rows_ AS (
    SELECT o_orderkey AS k,
           CAST(round(o_totalprice * 100) AS BIGINT) AS c
    FROM orders
    WHERE o_orderkey IS NOT NULL
),
drawn AS (
    SELECT k, c, b.b,
           CAST(concat('0x', substring(md5(concat(CAST(k AS VARCHAR), '_',
                CAST(b.b AS VARCHAR))), 1, 15)) AS BIGINT) % 1048576 AS u
    FROM rows_, (SELECT unnest(range(0, {_B})) AS b) b
),
per_b AS (
    SELECT b,
           sum(({_POIS_CASE}) * c) AS s,
           sum({_POIS_CASE}) AS n
    FROM drawn GROUP BY b
    HAVING sum({_POIS_CASE}) > 0
),
means AS (
    SELECT s * 1.0 / n / 100.0 AS mu,
           row_number() OVER (ORDER BY s * 1.0 / n / 100.0) AS r
    FROM per_b
),
base AS (
    SELECT count(*) AS n_rows, sum(c) * 1.0 / count(*) / 100.0 AS mean_obs
    FROM rows_
)
SELECT CAST(n_rows AS BIGINT) AS n_rows,
       CAST({_B} AS BIGINT) AS n_resamples,
       {sql_ieee_round("mean_obs", 4)} AS mean_price,
       {sql_ieee_round("(SELECT mu FROM means WHERE r = 3)", 4)} AS ci_lo,
       {sql_ieee_round("(SELECT mu FROM means WHERE r = 98)", 4)} AS ci_hi
FROM base
"""


# ---------------------------------------------------------------------------
# 3. Population Stability Index, month over month
# ---------------------------------------------------------------------------

_PSI_BIN = 50_000  # 500.00-currency-unit bins on integer cents / 100


def psi_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per consecutive-month pair: PSI of the order-price distribution
    over fixed integer-edge bins (width 500.00, add-one smoothing so
    empty bins stay finite). Bin counts are exact integers; each PSI
    term is the identical (p−q)·ln(p/q) on both engines, summed over
    the bounded bin set and rounded at 4 (the kl_source_drift
    precedent). Months are compared by lag over the month spine.

    Scale: one fact pass to (month, bin) grain; everything after is
    months × bins."""
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    mon = (
        F.year("o_orderdate") * 100 + F.month("o_orderdate")
    ).alias("mon")
    binned = (
        t(spark, sf_dir, "orders")
        .select(mon, (cents / _PSI_BIN).cast("long").alias("bin"))
        .groupBy("mon", "bin")
        .agg(F.count("*").alias("c"))
    )
    # dense (month × observed-bin) grid so add-one smoothing sees every
    # bin in every month — both engines build the identical grid
    months = binned.select("mon").distinct()
    bins = binned.select("bin").distinct()
    grid = months.crossJoin(F.broadcast(bins))  # months × bins, both tiny
    full = grid.join(binned, ["mon", "bin"], "left_outer").select(
        "mon", "bin", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    tot = full.groupBy("mon").agg(
        F.sum("c").alias("n"), F.count("*").alias("k")
    )
    sm = full.join(tot, "mon").select(
        "mon",
        "bin",
        ((F.col("c") + 1) / (F.col("n") + F.col("k"))).alias("p"),
    )
    prev = sm.select(
        (F.when(F.col("mon") % 100 == 12, F.col("mon") + 89)
         .otherwise(F.col("mon") + 1)).alias("mon"),
        F.col("bin"),
        F.col("p").alias("q"),
    )
    pair = sm.join(prev, ["mon", "bin"])
    # PSI terms quantized to exact 1e-9 integers before the per-month
    # fold (r12 fold discipline, the KL/χ² idiom)
    return (
        pair.groupBy("mon")
        .agg(
            F.count("*").alias("n_bins"),
            ieee_round(
                F.sum(
                    F.round(
                        (F.col("p") - F.col("q"))
                        * F.log(F.col("p") / F.col("q"))
                        * 1e9,
                        0,
                    ).cast("long")
                )
                / 1e9,
                4,
            ).alias("psi"),
        )
        .select(
            F.col("mon").cast("long").alias("mon"),
            F.col("n_bins").cast("long").alias("n_bins"),
            "psi",
        )
        .orderBy("mon")
    )


PSI_PRICE_DRIFT_SQL = f"""
WITH binned AS (
    SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
               AS mon,
           CAST(round(o_totalprice * 100) AS BIGINT) // {_PSI_BIN} AS bin,
           count(*) AS c
    FROM orders GROUP BY 1, 2
),
grid AS (
    SELECT m.mon, b.bin
    FROM (SELECT DISTINCT mon FROM binned) m,
         (SELECT DISTINCT bin FROM binned) b
),
full_ AS (
    SELECT g.mon, g.bin, coalesce(x.c, 0) AS c
    FROM grid g LEFT JOIN binned x ON g.mon = x.mon AND g.bin = x.bin
),
tot AS (
    SELECT mon, sum(c) AS n, count(*) AS k FROM full_ GROUP BY mon
),
sm AS (
    SELECT f.mon, f.bin, (f.c + 1) * 1.0 / (t.n + t.k) AS p
    FROM full_ f JOIN tot t ON f.mon = t.mon
),
pair AS (
    SELECT cur.mon, cur.p, prv.p AS q
    FROM sm cur
    JOIN sm prv
      ON cur.bin = prv.bin
     AND cur.mon = CASE WHEN prv.mon % 100 = 12
                        THEN prv.mon + 89 ELSE prv.mon + 1 END
)
SELECT CAST(mon AS BIGINT) AS mon,
       CAST(count(*) AS BIGINT) AS n_bins,
       {sql_ieee_round(
           "sum(CAST(round((p - q) * ln(p / q) * 1000000000)"
           " AS BIGINT)) / 1000000000.0", 4)} AS psi
FROM pair
GROUP BY mon
ORDER BY mon
"""


R7H_ENTRIES: dict[str, Entry] = {
    "geo_grid_join": Entry(geo_grid_join, GEO_GRID_JOIN_SQL),
    "bootstrap_ci_mean": Entry(bootstrap_ci_mean, BOOTSTRAP_CI_MEAN_SQL),
    "psi_price_drift": Entry(psi_price_drift, PSI_PRICE_DRIFT_SQL),
}
