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

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


from degen_util import assert_embeddings_entry_matches
from test_oracle_differential import TABLES

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
    assert_embeddings_entry_matches(
        spark, name, degen_dir, "degenerate embeddings"
    )
