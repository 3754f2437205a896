"""Seeded random-corpus fuzz for the embeddings family — the recipe's
fifth net, pointed at the vector consumers (cosine dedup, ANN brute/
LSH/IVF, k-means, semdedup, quantization), whose hazard surface is
GEOMETRIC TIES: with vectors sampled from a small pool, exact
duplicates (cos = 1), scaled copies (same direction, different norm —
still cos = 1), antipodes (cos = -1), and coarsely-quantized
components make tied similarities and tied centroid distances the
NORM, not the exception — any argmax/top-k whose tiebreak is not a
total order across engines diverges here. Zero vectors, NULL
embeddings, NULL labels, and NULL vec_ids ride along from the
degenerate net's hazard classes.

Entry list and comparison contract are IMPORTED from the degenerate
net (NaN/inf escape check, data-dependent check_* column skips, 2e-4
float tolerance) so the sweeps can never drift apart. Seeds FIXED."""

from __future__ import annotations

import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from degen_util import assert_embeddings_entry_matches
from test_degenerate_embeddings import DIM, ENTRIES
from test_oracle_differential import TABLES

REAL_SF = "/root/testdata/sf0.001"


def _pool(rng: np.random.RandomState) -> list[list[float] | None]:
    """14 template vectors: 8 coarsely-quantized random directions (so
    dot products tie), a zero vector, a scaled copy and an antipode of
    pool[0], an exact duplicate of pool[1], and NULL."""
    base = [
        [float(x) for x in np.round(rng.standard_normal(DIM) * 4) / 4]
        for _ in range(8)
    ]
    pool: list[list[float] | None] = list(base)
    pool.append([0.0] * DIM)                      # zero vector
    pool.append([x * 2.5 for x in base[0]])       # scaled copy (cos=1)
    pool.append([-x for x in base[0]])            # antipode (cos=-1)
    pool.append(list(base[1]))                    # exact duplicate
    pool.append(None)                             # NULL embedding
    # NaN/inf COMPONENTS are deliberately NOT in the pool: the
    # embeddings-net contract (degen_util.assert_embeddings_entry_
    # matches) asserts no NaN/inf ESCAPES into any result — a
    # non-finite component is an upstream-pipeline bug the data
    # contract excludes, same convention as NaN money. The boundary
    # itself (NaN propagates to NaN identically on both engines) is
    # pinned by test_nonfinite_component_boundary below.
    return pool


def _build_corpus(seed: int, d: str) -> None:
    rng = np.random.RandomState(seed)
    n = 80
    pool = _pool(rng)
    vecs = [pool[i] for i in rng.randint(0, len(pool), n)]
    emb = pa.table(
        {
            # unique-or-NULL ids (PK contract, as in the other nets)
            "vec_id": pa.array(
                [
                    None if rng.rand() < 0.05 else int(k)
                    for k in rng.permutation(n)
                ],
                pa.int64(),
            ),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            # tiny label domain: big blocks, plus NULL labels
            "label": pa.array(
                [
                    None if rng.rand() < 0.08 else int(v)
                    for v in rng.randint(0, 4, n)
                ],
                pa.int32(),
            ),
        }
    )
    for name in TABLES:
        if name != "embeddings":
            shutil.copy(f"{REAL_SF}/{name}.parquet", f"{d}/{name}.parquet")
    pq.write_table(emb, f"{d}/embeddings.parquet")


@pytest.fixture(scope="module", params=[47, 5150])
def fuzz_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"fuzz_emb_{request.param}")
    _build_corpus(request.param, str(d))
    return str(d)


@pytest.mark.parametrize("name", ENTRIES)
def test_embeddings_entry_survives_random_corpus(spark, fuzz_dir, name):
    assert_embeddings_entry_matches(spark, name, fuzz_dir, "random embeddings corpus")


def test_nonfinite_component_boundary(spark):
    """Pins the data-contract boundary the pool excludes: a NaN (or inf)
    vector component propagates to a NaN/inf dot product and norm
    IDENTICALLY on both engines — the divergence the contract prevents
    is the no-escape assertion, not cross-engine disagreement. If an
    engine upgrade changes either propagation, this surfaces loudly."""
    import duckdb
    import math

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [([1.0, float("nan"), 2.0],), ([1.0, float("inf"), 2.0],)],
        "v array<double>",
    )
    rows = df.select(
        F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x).alias("sq")
    ).collect()
    assert math.isnan(rows[0]["sq"]) and math.isinf(rows[1]["sq"])
    d = duckdb.sql(
        "SELECT list_sum(list_transform(v, x -> x*x)) FROM "
        "(SELECT ['1.0'::DOUBLE, 'nan'::DOUBLE, '2.0'::DOUBLE] AS v)"
    ).fetchone()[0]
    assert math.isnan(d)
    d = duckdb.sql(
        "SELECT list_sum(list_transform(v, x -> x*x)) FROM "
        "(SELECT ['1.0'::DOUBLE, 'inf'::DOUBLE, '2.0'::DOUBLE] AS v)"
    ).fetchone()[0]
    assert math.isinf(d)
