"""Local twin of the driver's DuckDB-oracle gate.

Runs every catalog entry both ways (PySpark and DuckDB) on the same parquet
and compares row count, column names, and order-insensitive values. Catching
a mismatch here is one pytest run; catching it in CORRECTNESS_r{N}.json is a
whole round.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

# default to the driver's correctness SF; SPARK_GRAFT_ORACLE_SF overrides
# (sf0.001 for quick local iteration)
import os

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return v


def _rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # sort by repr: None/str/int mix in a column (e.g. ROLLUP totals) would
    # make tuple comparison raise TypeError
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple(repr(v) for v in t),
    )


@pytest.fixture(scope="module")
def spark_results(spark, request):
    """Threaded prefetch of every entry's Spark result (cols, rows).

    Concurrent actions on one SparkSession from a worker pool are a
    supported Spark pattern; the serial alternative spends most of its
    ~2 min in scheduler idle time. Only entries actually selected for
    this run (honoring -k) are prefetched, so targeted runs stay fast.
    Failures are stored and re-raised inside the owning test so
    attribution is unchanged.

    SPARK_GRAFT_PREFETCH_THREADS tunes the pool (default 8): at sf0.1
    eight concurrent heavies stack enough simultaneous broadcast /
    shuffle state to kill an 8g driver JVM mid-run (observed twice in
    round 10: ~190 ConnectionRefused cascades); the full-catalog sf0.1
    pass runs with 4 threads and a bigger SPARK_GRAFT_DRIVER_MEM."""
    from concurrent.futures import ThreadPoolExecutor

    n_threads = int(os.environ.get("SPARK_GRAFT_PREFETCH_THREADS", "8"))

    selected = {
        item.callspec.params["name"]
        for item in request.session.items
        if item.function.__name__ == "test_catalog_matches_oracle"
        and hasattr(item, "callspec")
    }

    def run(name):
        try:
            sdf = CATALOG[name].spark_fn(spark, SF_DIR)
            return name, (sdf.columns, [tuple(r) for r in sdf.collect()])
        except Exception as exc:
            return name, exc

    with ThreadPoolExecutor(max_workers=n_threads) as pool:
        return dict(pool.map(run, sorted(selected)))


# entries with NO mass at a given scale — the only places an empty
# differential is legitimate. Everywhere else an empty result makes the
# parity assertion vacuous (empty == empty pins nothing), the silent
# failure class the r14 extreme-corpus audit surfaced: a topology or
# filter bug that empties BOTH engines' results would read as green
# here and in the driver's hash gate forever.
_EMPTY_OK = {
    # measured r14 (full-catalog row-count sweep at each SF): only
    # source_dup_matrix (no cross-source verbatim dups below sf0.1 —
    # pinned non-vacuous at sf0.1 by test_r5_entries) and, at 1/1000
    # scale, q11_important_share (share threshold — 238 rows at sf0.01).
    # Keyed on the sf-dir BASENAME (advisor r14): a trailing slash or
    # an alternate mount prefix in SPARK_GRAFT_ORACLE_SF must not
    # silently miss the whitelist and fail the non-vacuousness
    # assertion spuriously.
    "sf0.01": {"source_dup_matrix"},
    "sf0.001": {"source_dup_matrix", "q11_important_share"},
    # measured r18 (first full-catalog differential at sf0.1 — the r14
    # sweep's "only source_dup_matrix" note covered sf0.01/sf0.001;
    # sf0.1 had never been swept): 245/247 non-vacuous; two verified
    # scale artifacts, both engines agreeing empty==empty:
    # - events_burst_hours: the events generator spans a FIXED 720-hour
    #   window, so per-hour counts grow with SF while relative Poisson
    #   variance shrinks — max/mean hourly rate is 3.19 at sf0.001,
    #   2.16 at sf0.01, 1.26 at sf0.1, crossing below the 1.5x burst
    #   threshold; zero flagged hours, zero islands.
    # - q11_important_share: fixed share threshold (v > total/1000)
    #   over a part population that grows with SF — max per-part share
    #   is 0.00216 at sf0.01 (238 qualifiers) but 0.00044 at sf0.1
    #   (zero). Real TPC-H scales Q11's fraction by 1/SF for exactly
    #   this reason; this catalog pins the fixed-fraction form, so the
    #   entry is exercised non-vacuously at sf0.01 (the driver's SF)
    #   and legitimately empty above it.
    "sf0.1": {"events_burst_hours", "q11_important_share"},
}
_EMPTY_OK_HERE = _EMPTY_OK.get(
    os.path.basename(os.path.normpath(SF_DIR)), set()
)


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_catalog_matches_oracle(spark, ddb, spark_results, name):
    entry = CATALOG[name]
    got = spark_results[name]
    if isinstance(got, Exception):
        raise got
    spark_cols, spark_rows = got

    if name not in _EMPTY_OK_HERE:
        assert spark_rows, (
            f"{name}: empty result at {SF_DIR} — the differential below "
            f"is vacuous; whitelist it here only if the emptiness is a "
            f"verified scale artifact"
        )

    if entry.sql is None:
        assert len(spark_rows) >= 0  # rows-only check
        return

    res = ddb.execute(entry.sql)
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(ddb_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(ddb_rows), f"{name}: row count differs"
    sset = _rowset(spark_rows, spark_cols)
    dset = _rowset(ddb_rows, ddb_cols)
    mism = [i for i, (a, b) in enumerate(zip(sset, dset)) if a != b][:3]
    assert sset == dset, (
        f"{name}: values differ; first mismatches at sorted idx {mism}: "
        + "; ".join(f"spark={sset[i]} duck={dset[i]}" for i in mism)
    )
