"""Grand combined fuzz — every data table randomized SIMULTANEOUSLY.

The five per-table nets randomize one table with the others real, so a
join always has one clean side. This net assembles a corpus from all
five builders at once (random orders+lineitem, events, documents,
customer/supplier/part, embeddings; only nation/region stay real so
the region/segment filter constants resolve) and re-runs every
oracle-paired entry whose SQL touches TWO OR MORE fuzzed tables — the
interaction surface the per-table nets cannot reach: NULL keys on BOTH
sides of a join, dangling FKs against sparse random dims, tied
measures flowing into tied join keys.

Single-table entries are deliberately excluded: against this corpus
they see the same marginal distribution their own net already sweeps,
so re-running them here buys nothing. Entries under the embeddings
family compare through the tolerant embeddings contract; everything
else is strict. Seeds FIXED."""

from __future__ import annotations

import re
import shutil

import pytest

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

from degen_util import assert_embeddings_entry_matches, assert_entry_matches
from test_degenerate_embeddings import ENTRIES as EMB_ENTRIES
from test_fuzz_differential import _build_corpus as build_ol
from test_fuzz_dims import _build_corpus as build_dims
from test_fuzz_docs import _build_corpus as build_docs
from test_fuzz_embeddings import _build_corpus as build_emb
from test_fuzz_events import _build_corpus as build_ev

REAL_SF = "/root/testdata/sf0.001"
_FUZZED = (
    "orders lineitem events documents customer supplier part embeddings"
).split()
_FROM = {
    "orders": "ol", "lineitem": "ol", "events": "ev", "documents": "docs",
    "customer": "dims", "supplier": "dims", "part": "dims",
    "embeddings": "emb",
}


def _strip_sql_comments(sql: str) -> str:
    """Remove -- line comments and /* */ block comments so a table name
    mentioned only in prose never counts as 'touched' (round-9 advice:
    comment drift silently changed the multi-table selection, and with
    it pytest_shards.py's shard-weight estimate). Literal-aware (r10
    advice): a '--' inside a SQL string literal is content, not a
    comment — a pure-regex strip would eat the rest of that line and
    with it any table names after the literal."""
    out = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":  # string literal; '' is the escaped quote
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(sql[i : j + 1])
            i = j + 1
        elif sql.startswith("--", i):
            nl = sql.find("\n", i)
            out.append(" ")
            i = n if nl == -1 else nl
        elif sql.startswith("/*", i):
            end = sql.find("*/", i)
            out.append(" ")
            i = n if end == -1 else end + 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _multi_table_entries():
    out = []
    for name, e in CATALOG.items():
        if e.sql is None:
            continue
        sql = _strip_sql_comments(e.sql)
        touched = [t for t in _FUZZED if re.search(rf"\b{t}\b", sql)]
        if len(touched) >= 2:
            out.append(name)
    return sorted(out)


@pytest.fixture(scope="module", params=[61, 7001, 303])
def fuzz_dir(request, tmp_path_factory):
    # 303 pinned r9: the exploration wave's find — a year whose units
    # all round to zero drove q8's share denominator to exactly 0
    # (Spark ANSI `/` throws, DuckDB yields NULL); neither original
    # seed produced an all-zero year
    seed = request.param
    root = tmp_path_factory.mktemp(f"fuzz_all_{seed}")
    parts = {}
    for tag, builder in (
        ("ol", build_ol), ("ev", build_ev), ("docs", build_docs),
        ("dims", build_dims), ("emb", build_emb),
    ):
        d = root / tag
        d.mkdir()
        builder(seed, str(d))
        parts[tag] = d
    combined = root / "combined"
    combined.mkdir()
    for t in _FUZZED:
        shutil.copy(parts[_FROM[t]] / f"{t}.parquet", combined / f"{t}.parquet")
    for t in ("nation", "region"):
        shutil.copy(f"{REAL_SF}/{t}.parquet", combined / f"{t}.parquet")
    return str(combined)


@pytest.mark.parametrize("name", _multi_table_entries())
def test_multi_table_entry_survives_combined_corpus(spark, fuzz_dir, name):
    if name in EMB_ENTRIES:
        assert_embeddings_entry_matches(spark, name, fuzz_dir, "combined fuzz corpus")
    else:
        assert_entry_matches(spark, name, fuzz_dir, "combined fuzz corpus")
