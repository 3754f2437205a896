"""The fully-degenerate limits the per-table nets never reach: every
data table EMPTY, and every non-key column ALL-NULL (round-9 verdict
ask #5b).

The nine per-table degenerate nets mix pathological rows with real
rows in the other tables, so an aggregate always has SOME non-NULL
input and a join always has SOME matching keys. These two corpora are
the true boundary cases:

- ``empty``: all ten tables zero-row (schema preserved byte-for-byte
  from the real sf0.001 files). Aggregates produce zero groups or a
  single NULL-total row (sum over empty = NULL, count = 0), LIMIT/topk
  return nothing, windows never partition, and any plan that divides
  by a count or assumes ``first()`` exists must degrade identically on
  both engines.
- ``allnull``: six rows per table (five for region), join/group keys
  kept REAL so rows still flow through joins and into groups, every
  other column NULL. This is the all-NULL-measure limit: sum/avg over
  all-NULL groups yield NULL (not 0), count(col)=0 while count(*)=6,
  date functions fold NULL, text/tokenizer pipelines see NULL text,
  embeddings ops see NULL vectors — in every group at once.
- ``onerow``: exactly ONE real row per table. Every group has size 1,
  every window partition is trivial, every quantile/percentile IS the
  single value, ntile puts one row in bucket 1, lag/lead are NULL
  everywhere, and regression/variance folds divide by n-1 = 0.
- ``alldup``: six IDENTICAL copies of each table's first row
  (duplicate PRIMARY KEYS included — the rawest tie density possible).
  Every sort key ties, every rank is a 6-way tie, every distinct
  collapses 6→1, self-joins fan out 36 pairs — any tie-break that
  silently leans on partition order or engine sort stability shows
  here first.
- ``mixdup`` (r10 verdict ask #7a): the first THREE distinct rows,
  each duplicated twice ([0,0,1,1,2,2]) — alldup's tie density with
  NON-TRIVIAL groups. Unlike alldup, sort keys now mix ties with real
  order (a tie group has neighbors above and below), distincts
  collapse 6→3 (not 6→1), grouped aggregates see k=2 multiplicity
  inside k=3 genuine groups, and joins fan out 2×2 per matched key
  instead of 6×6 on a single key — the regime where a wrong tiebreak
  can REORDER groups rather than collapse into one.
- ``dupnull`` (r11): the missing quadrant between alldup and allnull —
  three distinct KEY rows duplicated twice each with every non-key
  column NULL. alldup ties on real values; allnull ranks unique keys;
  here every sort/rank runs over ALL-NULL measures inside
  duplicated-key groups, so engine NULL placement, tie-breaking, and
  multiplicity interact in one corpus.

Contract identical to the other nets: the Spark plan must execute,
and where oracle SQL exists both engines must agree exactly (tolerant
embeddings contract for the embeddings family). Spark results are
prefetched on a small thread pool (same pattern as
test_oracle_differential) so the sweep's wall time is bounded by the
slowest entries, not the sum.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

from degen_util import run_oracle, EMB_DATA_DEPENDENT_COLS
from test_degenerate_embeddings import ENTRIES as EMB_ENTRIES
from test_oracle_differential import TABLES, _rowset

REAL_SF = "/root/testdata/sf0.001"

# columns that stay REAL in the allnull corpus: identity + join keys,
# so joins still match and groups still form — everything measured,
# named, dated, or texted about those keys is NULL
_KEEP = {
    "region": {"r_regionkey"},
    "nation": {"n_nationkey", "n_regionkey"},
    "customer": {"c_custkey", "c_nationkey"},
    "supplier": {"s_suppkey", "s_nationkey"},
    "part": {"p_partkey"},
    "orders": {"o_orderkey", "o_custkey"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"},
    "events": {"event_id", "user_id"},
    "documents": {"doc_id"},
    "embeddings": {"vec_id"},
}

_N_ROWS = 6


def _build(kind: str, out_dir: str) -> None:
    for t in TABLES:
        real = pq.read_table(f"{REAL_SF}/{t}.parquet")
        if kind == "empty":
            shaped = real.slice(0, 0)
        elif kind == "onerow":
            shaped = real.slice(0, 1)
        elif kind == "alldup":
            one = real.slice(0, 1)
            shaped = pa.concat_tables([one] * _N_ROWS)
        elif kind == "mixdup":
            k = min(3, real.num_rows)
            shaped = pa.concat_tables(
                [real.slice(i, 1) for i in range(k) for _ in range(2)]
            )
        elif kind == "dupnull":
            # duplicates × all-NULL measures: three distinct KEY rows,
            # each duplicated twice, every non-key column NULL. alldup
            # ties on REAL measure values; allnull has UNIQUE keys —
            # this is the missing quadrant: rank/sort over all-NULL
            # measures INSIDE duplicated-key groups (NULL placement ×
            # tie-break × multiplicity interaction)
            k = min(3, real.num_rows)
            cols = []
            for field in real.schema:
                if field.name in _KEEP[t]:
                    cols.append(real.column(field.name).slice(0, k))
                else:
                    cols.append(pa.nulls(k, type=field.type))
            distinct = pa.table(cols, schema=real.schema)
            shaped = pa.concat_tables(
                [distinct.slice(i, 1) for i in range(k) for _ in range(2)]
            )
        else:  # allnull
            n = min(_N_ROWS, real.num_rows)
            cols = []
            for field in real.schema:
                if field.name in _KEEP[t]:
                    cols.append(real.column(field.name).slice(0, n))
                else:
                    cols.append(pa.nulls(n, type=field.type))
            shaped = pa.table(cols, schema=real.schema)
        pq.write_table(shaped, f"{out_dir}/{t}.parquet")


@pytest.fixture(
    scope="module",
    params=["empty", "allnull", "onerow", "alldup", "mixdup", "dupnull"],
)
def degen_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"degen_{request.param}")
    _build(request.param, str(d))
    return str(d)


@pytest.fixture(scope="module")
def spark_results(spark, degen_dir, request):
    from concurrent.futures import ThreadPoolExecutor

    selected = {
        item.callspec.params["name"]
        for item in request.session.items
        if item.function.__name__ == "test_entry_survives_degenerate_limit"
        and hasattr(item, "callspec")
    }

    def run(name):
        try:
            sdf = CATALOG[name].spark_fn(spark, degen_dir)
            return name, (sdf.columns, [tuple(r) for r in sdf.collect()])
        except Exception as exc:
            return name, exc

    with ThreadPoolExecutor(max_workers=4) as pool:
        return dict(pool.map(run, sorted(selected)))


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_entry_survives_degenerate_limit(spark, degen_dir, spark_results, name):
    entry = CATALOG[name]
    got = spark_results[name]
    if isinstance(got, Exception):
        raise got
    spark_cols, spark_rows = got

    if entry.sql is None:
        return  # rows-only: executing without throwing IS the contract

    data_dependent = (
        EMB_DATA_DEPENDENT_COLS.get(name, set()) if name in EMB_ENTRIES else set()
    )

    def drop_cols(cols, rows):
        keep = [c for c in cols if c not in data_dependent]
        idx = [cols.index(c) for c in keep]
        return keep, [tuple(r[i] for i in idx) for r in rows]

    if data_dependent:
        spark_cols, spark_rows = drop_cols(spark_cols, spark_rows)
    ddb_cols, ddb_rows = run_oracle(degen_dir, entry.sql)
    if data_dependent:
        ddb_cols, ddb_rows = drop_cols(ddb_cols, ddb_rows)

    assert len(spark_rows) == len(ddb_rows), (
        f"{name}: row count differs on degenerate-limit corpus "
        f"(spark={len(spark_rows)} duck={len(ddb_rows)})"
    )
    sset = _rowset(spark_rows, spark_cols)
    dset = _rowset(ddb_rows, ddb_cols)
    if name in EMB_ENTRIES:
        for a, b in zip(sset, dset):
            assert len(a) == len(b), name
            for x, y in zip(a, b):
                if isinstance(x, float) and isinstance(y, float):
                    assert abs(x - y) <= 2e-4, (name, a, b)
                else:
                    assert x == y, (name, a, b)
    else:
        mism = [i for i, (a, b) in enumerate(zip(sset, dset)) if a != b][:3]
        assert sset == dset, (
            f"{name}: values differ on degenerate-limit corpus; "
            f"first mismatches at sorted idx {mism}: "
            + "; ".join(f"spark={sset[i]} duck={dset[i]}" for i in mism)
        )
