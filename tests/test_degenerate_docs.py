"""Degenerate-input sweep over every documents-consuming catalog entry.

The latent-bug class the round-5 advice kept finding — NULL text through
NOT IN's three-valued logic, ANSI element_at throwing on 1-token docs —
shares one root: the synthetic corpus is too well-behaved (≥10 tokens,
zero NULLs), so pathological documents never execute. This sweep runs
every entry whose plan or oracle touches ``documents`` against a corpus
of edge cases:

- empty string, whitespace-only, single token, NULL text
- one token repeated (degenerate vocabulary)
- a long document (sequence/window bounds at the other extreme)

Two assertions per entry: (1) the Spark plan executes without throwing
(no ANSI OOB, no sequence-bounds crash, no divide-by-zero surfacing);
(2) where oracle SQL exists, Spark and DuckDB still agree row-for-row —
cross-engine NULL/empty semantics are exactly where the engines love to
diverge.
"""

from __future__ import annotations

import shutil

import pytest

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

from degen_util import assert_entry_matches
from test_oracle_differential import TABLES

REAL_SF = "/root/testdata/sf0.001"

DEGENERATE_DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (0, "", "en", "src0", 0),
    (1, "   ", "en", "src0", 3),
    (2, "solo", "xx", "src1", 4),
    (3, "a a a a a a a a a a", "en", "src1", 19),
    (4, None, "en", "src2", None),
    (5, " ".join(f"w{i % 7}" for i in range(4000)), "fr", "src2", 4 * 4000),
    (6, "exact duplicate text body", "en", "src3", 25),
    (7, "exact duplicate text body", "en", "src4", 25),
    # r8: NULL grouping keys — a NULL lang/source must form its own
    # group identically on both engines (GROUP BY keeps NULL; a = b
    # join equality drops it), and a NULL doc_id must never pair in
    # id-ordered pair joins (a.doc_id < b.doc_id is NULL-false)
    (8, "null keyed body", None, None, 15),
    (None, "null id body", "en", "src0", 12),
]


@pytest.fixture(scope="module")
def degen_dir(spark, tmp_path_factory):
    """sf0.001 with documents.parquet swapped for the degenerate corpus."""
    d = tmp_path_factory.mktemp("degen")
    for name in TABLES:
        if name != "documents":
            shutil.copy(f"{REAL_SF}/{name}.parquet", d / f"{name}.parquet")
    # single-file parquet via pyarrow (matching the real testdata layout —
    # a Spark write would produce a directory DuckDB's path can't glob)
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*DEGENERATE_DOCS))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(cols[0], pa.int64()),
                "text": pa.array(cols[1], pa.string()),
                "lang": pa.array(cols[2], pa.string()),
                "source": pa.array(cols[3], pa.string()),
                "n_chars": pa.array(cols[4], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def _doc_entries():
    return sorted(
        name
        for name, e in CATALOG.items()
        if (e.sql and "documents" in e.sql)
        or (e.sql is None and "doc" in name or name.startswith("text_"))
    )


@pytest.mark.parametrize("name", _doc_entries())
def test_entry_survives_degenerate_docs(spark, degen_dir, name):
    assert_entry_matches(spark, name, degen_dir, "degenerate docs")
