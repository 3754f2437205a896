"""Schema-shape fuzz: the same DATA under a different physical parquet
layout must produce identical results (round-9 verdict ask #5a).

Value-level fuzz can never catch a reader-level assumption — a plan
that accidentally depends on column ORDER (positional access after a
``mapInPandas``/arrow hop), on everything arriving in ONE row group
(partition-count-sensitive tie-breaking: Spark splits scan tasks on
row-group boundaries), or on dictionary-encoded pages (encoding-
sensitive predicate pushdown) produces the same answer on every
value-fuzzed corpus because those corpora are all written the same
way the real testdata is.

This net rewrites sf0.001 byte-identically at the value level but
physically adversarial:

- ``reversed_tinyrg_nodict``: column order REVERSED, row-group size 61
  (every table becomes many row groups — the events/lineitem scans
  split into dozens of tasks), dictionary encoding OFF.
- ``rot3_rg17``: column order rotated by 3, row-group size 17,
  dictionary encoding ON (the default, but now over tiny pages).

The oracle side reads the ORIGINAL sf0.001 files: DuckDB-on-original
is ground truth, so any Spark sensitivity to physical layout shows as
a divergence even if both engines happened to share it. (The standard
nets run both engines on the same files; here that would let a shared
layout quirk cancel out.)

Rows-only entries must execute and return the same ROW COUNT as on
the original layout (their values are checked by their check_* twins
on the standard layout; count-stability under re-layout is the
reader-level invariant).
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

from degen_util import run_oracle
from test_degenerate_embeddings import ENTRIES as EMB_ENTRIES
from test_oracle_differential import TABLES, _rowset

REAL_SF = "/root/testdata/sf0.001"

_SHAPES = {
    "reversed_tinyrg_nodict": dict(perm="reversed", rg=61, use_dict=False),
    "rot3_rg17": dict(perm="rot3", rg=17, use_dict=True),
}


def _permute(names: list[str], how: str) -> list[str]:
    if how == "reversed":
        return list(reversed(names))
    if how == "rot3":
        k = 3 % len(names)
        return names[k:] + names[:k]
    raise ValueError(how)


def _build(shape: dict, out_dir: str) -> None:
    for t in TABLES:
        real = pq.read_table(f"{REAL_SF}/{t}.parquet")
        shaped = real.select(_permute(real.schema.names, shape["perm"]))
        pq.write_table(
            shaped,
            f"{out_dir}/{t}.parquet",
            row_group_size=shape["rg"],
            use_dictionary=shape["use_dict"],
        )


@pytest.fixture(scope="module", params=sorted(_SHAPES))
def shape_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"shape_{request.param}")
    _build(_SHAPES[request.param], str(d))
    return str(d)


@pytest.fixture(scope="module")
def spark_results(spark, shape_dir, request):
    from concurrent.futures import ThreadPoolExecutor

    selected = {
        item.callspec.params["name"]
        for item in request.session.items
        if item.function.__name__ == "test_entry_layout_invariant"
        and hasattr(item, "callspec")
    }

    def run(name):
        try:
            sdf = CATALOG[name].spark_fn(spark, shape_dir)
            return name, (sdf.columns, [tuple(r) for r in sdf.collect()])
        except Exception as exc:
            return name, exc

    with ThreadPoolExecutor(max_workers=4) as pool:
        return dict(pool.map(run, sorted(selected)))


@pytest.fixture(scope="module")
def rows_only_baseline(spark, request):
    """Row counts of the rows-only entries on the ORIGINAL layout —
    restricted to the names actually selected for this run (mirrors the
    spark_results selection, so a -k subset doesn't pay for the full
    rows-only sweep; advisor r10)."""
    selected = {
        item.callspec.params["name"]
        for item in request.session.items
        if item.function.__name__ == "test_entry_layout_invariant"
        and hasattr(item, "callspec")
    }
    return {
        name: CATALOG[name].spark_fn(spark, REAL_SF).count()
        for name in sorted(selected)
        if CATALOG[name].sql is None
    }


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_entry_layout_invariant(
    spark, shape_dir, spark_results, rows_only_baseline, name
):
    entry = CATALOG[name]
    got = spark_results[name]
    if isinstance(got, Exception):
        raise got
    spark_cols, spark_rows = got

    if entry.sql is None:
        assert len(spark_rows) == rows_only_baseline[name], (
            f"{name}: row count changed under physical re-layout "
            f"(original={rows_only_baseline[name]} reshaped={len(spark_rows)})"
        )
        return

    # ground truth: DuckDB over the ORIGINAL files
    ddb_cols, ddb_rows = run_oracle(REAL_SF, entry.sql)
    assert len(spark_rows) == len(ddb_rows), (
        f"{name}: row count differs under physical re-layout "
        f"(spark={len(spark_rows)} duck-original={len(ddb_rows)})"
    )
    sset = _rowset(spark_rows, spark_cols)
    dset = _rowset(ddb_rows, ddb_cols)
    if name in EMB_ENTRIES:
        # same last-ulp tolerance as the embeddings nets: re-layout
        # changes scan-task boundaries and with them float fold order
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
            f"{name}: values differ under physical re-layout; "
            f"first mismatches at sorted idx {mism}: "
            + "; ".join(f"spark={sset[i]} duck={dset[i]}" for i in mism)
        )
