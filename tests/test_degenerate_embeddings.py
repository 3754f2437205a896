"""Degenerate-input sweep over the embeddings-consuming catalog entries —
the vector twin of tests/test_degenerate_docs.py.

Edge cases a real 100 TB embedding corpus will contain that the synthetic
table never exercises: the all-zero vector (norm floor must engage — no
division blow-up, no NaN cosine), a NULL embedding row, a NULL label
(blocking/grouping key), and a singleton label (blocks with no possible
pair). Every entry must execute without throwing; entries with an oracle
must still agree with DuckDB row-for-row.
"""

from __future__ import annotations

import math
import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

from test_oracle_differential import TABLES, _rowset

REAL_SF = "/root/testdata/sf0.001"
DIM = 64

ENTRIES = [
    "dedup_embedding_cosine",
    "embedding_centroids",
    "embedding_quantize",
    "similarity_topk",
    "similarity_lsh_topk",
    "similarity_ivf_topk",
    "check_lsh_topk",
    "check_ivf_topk",
    "decontaminate_embedding",
    "semdedup_prune",
    "kmeans_embeddings",
    "ndcg_label_eval",
    "rrf_fusion",
    "embedding_norm_outliers",
]


def _vec(seed: int) -> list[float]:
    return [math.sin(seed * 31 + i) for i in range(DIM)]


DEGENERATE_EMB = [
    # (vec_id, embedding, label)
    (0, [0.0] * DIM, 1),          # zero vector: norm floor must engage
    (1, _vec(1), 1),
    (2, _vec(1), 1),              # exact duplicate of vec 1 (cos = 1)
    (3, None, 2),                 # NULL embedding
    (4, _vec(4), None),           # NULL label (blocking key)
    (5, _vec(5), 3),              # singleton label: block of one
    (6, _vec(6), 2),
    (7, [x * -1.0 for x in _vec(6)], 2),  # antipode (cos = -1)
    # r8 NULL-key probe: a keyless vector — id-ordered pair joins must
    # drop it on both engines (a.id < b.id is NULL-false), and any
    # (score, id) ranking tiebreak must not diverge on NULL placement
    (None, _vec(9), 1),
]


@pytest.fixture(scope="module")
def degen_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("degen_emb")
    for name in TABLES:
        if name != "embeddings":
            shutil.copy(f"{REAL_SF}/{name}.parquet", d / f"{name}.parquet")
    cols = list(zip(*DEGENERATE_EMB))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(cols[0], pa.int64()),
                "embedding": pa.array(cols[1], pa.list_(pa.float32())),
                "label": pa.array(cols[2], pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    return str(d)


@pytest.mark.parametrize("name", ENTRIES)
def test_entry_survives_degenerate_embeddings(spark, degen_dir, name):
    entry = CATALOG[name]
    sdf = entry.spark_fn(spark, degen_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]  # must not throw

    for row in spark_rows:  # no NaN/inf escapes into results
        for v in row:
            if isinstance(v, float):
                assert not math.isnan(v) and not math.isinf(v), (name, row)
            if isinstance(v, list):
                assert all(
                    not (isinstance(x, float) and (math.isnan(x) or math.isinf(x)))
                    for x in v
                ), (name, row)

    if entry.sql is None:
        return

    # The check_* entries' boolean columns encode DATA-DEPENDENT
    # expectations (k rows per query, recall floor) that hold on the
    # driver corpus but not on a 7-vector pathological one — LSH
    # legitimately returns fewer than k candidates from a near-empty
    # bucket. Compare only the universal columns there: the cross-engine
    # exact-top-1 baseline and n_beats_exact (approximate search can
    # never beat exact — that IS corpus-independent).
    data_dependent = {
        "check_lsh_topk": {"rows_complete", "recall_floor_ok"},
        "check_ivf_topk": {"rows_complete", "recall_floor_ok"},
    }.get(name, set())
    def drop_cols(cols, rows):
        keep = [c for c in cols if c not in data_dependent]
        idx = [cols.index(c) for c in keep]
        return keep, [tuple(r[i] for i in idx) for r in rows]

    if data_dependent:
        spark_cols, spark_rows = drop_cols(spark_cols, spark_rows)
    con = duckdb.connect()
    try:
        for t_name in TABLES:
            con.execute(
                f"CREATE VIEW {t_name} AS "
                f"SELECT * FROM '{degen_dir}/{t_name}.parquet'"
            )
        res = con.execute(entry.sql)
        ddb_cols = [d[0] for d in res.description]
        ddb_rows = res.fetchall()
    finally:
        con.close()
    if data_dependent:
        ddb_cols, ddb_rows = drop_cols(ddb_cols, ddb_rows)
    assert len(spark_rows) == len(ddb_rows), (
        f"{name}: row count differs on degenerate embeddings "
        f"(spark={len(spark_rows)} duck={len(ddb_rows)})"
    )
    sset = _rowset(spark_rows, spark_cols)
    dset = _rowset(ddb_rows, ddb_cols)
    # tolerant float compare (2e-4): the synthetic degenerate vectors can
    # land a 4dp-rounded aggregate exactly on a rounding boundary where
    # the engines' summation orders differ in the last ulp — a test-data
    # artifact, not an engine bug (the strict oracle sweep on real data
    # stays exact)
    for a, b in zip(sset, dset):
        assert len(a) == len(b), name
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                assert abs(x - y) <= 2e-4, (name, a, b)
            else:
                assert x == y, (name, a, b)
