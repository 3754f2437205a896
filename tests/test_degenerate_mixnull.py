"""``mixnull`` corpus: duplicated keys where each key-group holds one
REAL-measure row and one ALL-NULL-measure row (r11 verdict ask #6a).

Every prior corpus keeps NULL sort keys either absent (mixdup: ties on
real values), universal (dupnull/allnull: every measure NULL, so NULLs
only ever order against other NULLs), or keyed uniquely (allnull). The
untested regime is a NULL measure ordering AGAINST a real value inside
the same window partition / sort — exactly where the engines' default
NULL ends diverge: Spark places NULLS FIRST on ascending and NULLS
LAST on descending, DuckDB defaults to NULLS LAST on both, so an entry
whose window ORDER BY or output sort touches a nullable measure agrees
cross-engine only if it pins NULL placement explicitly (or its oracle
compensates). Descending sorts are the specifically-called-out blind
spot: every NULL-placement bug caught by earlier corpora was on an
ascending key.

Corpus shape, per table: the first three distinct rows, each
duplicated once, with the SECOND copy's non-key columns NULLed —
``[0real, 0null, 1real, 1null, 2real, 2null]``. Join keys stay real on
both copies (joins still match, groups still form), so every group and
window partition contains the NULL-vs-value ordering decision, under
tie density (duplicated keys) at the same time.

Scope: originally the window/rank entry families per the r11 verdict's
targeted-sweep ask (60 entries, green on first contact) — then the
one-time FULL-catalog sweep caught ``agg_correlation`` CRASHING outside
that scope (Spark 4's ANSI ``corr`` raises DIVIDE_BY_ZERO on the
zero-variance series this corpus produces, where DuckDB returns NULL),
so the standing net covers the whole catalog like the other six limit
corpora (~2.5 min sequential — the 6-row corpus keeps every entry
plan-compile-bound).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

from degen_util import (
    assert_embeddings_entry_matches,
    assert_entry_matches,
)
from test_degenerate_embeddings import ENTRIES as EMB_ENTRIES
from test_degenerate_empty_allnull import _KEEP
from test_oracle_differential import TABLES

REAL_SF = "/root/testdata/sf0.001"

ENTRIES = sorted(CATALOG)


def _build(out_dir: str) -> None:
    k = 3
    for t in TABLES:
        real = pq.read_table(f"{REAL_SF}/{t}.parquet")
        n = min(k, real.num_rows)
        null_cols = []
        for field in real.schema:
            if field.name in _KEEP[t]:
                null_cols.append(real.column(field.name).slice(0, n))
            else:
                null_cols.append(pa.nulls(n, type=field.type))
        nulled = pa.table(null_cols, schema=real.schema)
        shaped = pa.concat_tables(
            [
                piece
                for i in range(n)
                for piece in (real.slice(i, 1), nulled.slice(i, 1))
            ]
        )
        pq.write_table(shaped, f"{out_dir}/{t}.parquet")


@pytest.fixture(scope="module")
def mixnull_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("degen_mixnull")
    _build(str(d))
    return str(d)


@pytest.mark.parametrize("name", ENTRIES)
def test_entry_survives_mixnull(spark, mixnull_dir, name):
    if name in EMB_ENTRIES:
        assert_embeddings_entry_matches(
            spark, name, mixnull_dir, "mixnull corpus"
        )
    else:
        assert_entry_matches(spark, name, mixnull_dir, "mixnull corpus")
