"""Unit tests: dedup families + similarity search on constructed corpora
with known duplicates, and recall checks of approximate vs exact methods."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
    embedding_dup_pairs,
)
from data_engineering_project_capstone_spark.operators.similarity import (
    cosine_topk,
    lsh_topk,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the tall fence and the birds sing in the morning light over "
    "the quiet village near the river bend"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact duplicate of 1
        (3, BASE + " extra trailing words here"),  # near-dup of 1
        (4, BASE.replace("quick", "slow").replace("lazy", "busy")),  # near-dup
        (5, "completely different text about spark catalyst optimizer "
            "plans shuffles partitions and adaptive execution engines "
            "running distributed queries on large clusters every day"),
        (6, "another unrelated document mentioning parquet files columnar "
            "storage compression encodings and predicate pushdown scans "
            "across petabyte data lakes with schema evolution"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(spark, docs):
    kept = exact_dedup(docs)
    ids = {r["doc_id"] for r in kept.collect()}
    assert 2 not in ids  # duplicate of 1 dropped
    assert ids == {1, 3, 4, 5, 6}


def test_jaccard_pairs(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in jaccard_pairs(docs).collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.5
    assert all(not (a in (5, 6) or b == 5) for a, b in pairs if (a, b) != (5, 6))


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in minhash_lsh_pairs(docs, threshold=0.3).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs
    # unrelated docs never pair with the BASE cluster
    assert not any({a, b} & {5, 6} and {a, b} & {1, 2, 3} for a, b in pairs)


def test_simhash_pairs(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_pairs(docs, max_hamming=20).collect()}
    assert pairs.get((1, 2)) == 0  # identical text → identical signature
    assert (1, 3) in pairs  # near-dup → small hamming
    assert pairs[(1, 3)] <= 20


def test_null_text_policy_uniform(spark):
    """NULL text ≡ '' across all dedup families: exact-dup collapses all
    null/empty docs to one min-id survivor; pair families emit nothing
    for them (no shingles/tokens)."""
    rows = [
        (1, None),
        (2, ""),
        (3, "   "),  # whitespace-only normalizes to ''
        (4, BASE),
        (5, BASE),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = {r["doc_id"] for r in exact_dedup(df).collect()}
    assert kept == {1, 4}  # 1 survives the null/empty group; 4 the BASE pair
    for fn in (jaccard_pairs, minhash_lsh_pairs, simhash_pairs):
        pairs = fn(df).select("id_a", "id_b").collect()
        ids = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
        assert not ids & {1, 2, 3}, f"{fn.__name__} paired an empty doc"


def test_embedding_dup_pairs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0], 0),
        (2, [1.0, 0.001, 0.0], 0),   # near-identical to 1
        (3, [0.0, 1.0, 0.0], 0),     # orthogonal
        (4, [1.0, 0.0, 0.0], 1),     # same dir as 1, different block
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    pairs = {(r["id_a"], r["id_b"]) for r in embedding_dup_pairs(df).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs
    assert (1, 4) not in pairs  # blocked apart — documented recall trade


def test_embedding_lsh_blocking_recall(spark):
    """Default (no block column) = banded LSH blocking. Recall measured
    against explicit all-pairs on constructed near-dup vectors
    (cos ≥ ~0.98 twins): 4 bands × 8 bits should catch nearly all."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for i in range(80):
        base = rng.normal(size=64)
        base /= np.linalg.norm(base)
        twin = base + rng.normal(scale=0.02, size=64)  # ‖noise‖≈0.16 → cos≈0.987
        rows.append((2 * i, [float(x) for x in base]))
        rows.append((2 * i + 1, [float(x) for x in twin]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_dup_pairs(
            df, block_col=None, allow_all_pairs=True, threshold=0.95
        ).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_dup_pairs(df, block_col=None, threshold=0.95).collect()
    }
    assert exact, "fixture must contain true near-dup pairs"
    assert lsh <= exact  # blocking only prunes candidates, never invents
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, f"banded-LSH recall {recall:.2f} over {len(exact)} pairs"


def test_embedding_all_pairs_requires_flag(spark):
    """block_col=None without allow_all_pairs must NOT cross-join: the
    plan has to carry the LSH bucket join, not a CartesianProduct."""
    rows = [(i, [float(i), 1.0, 0.0]) for i in range(4)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    plan = (
        embedding_dup_pairs(df, block_col=None, dim=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_lsh_topk_recall(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") < 20)
    exact = cosine_topk(embeddings, queries, k=1).collect()
    approx = lsh_topk(embeddings, queries, k=1, bits=4, probes=5).collect()
    exact_best = {r["query_id"]: r["neighbor_id"] for r in exact}
    approx_best = {r["query_id"]: r["neighbor_id"] for r in approx}
    hits = sum(1 for q, n in exact_best.items() if approx_best.get(q) == n)
    # 4-bit LSH on 64-dim data: expect well above random but below exact
    assert hits / len(exact_best) >= 0.3, f"LSH top-1 recall {hits}/{len(exact_best)}"
    # every query got some answer
    assert set(approx_best) == set(exact_best)


def test_ivf_topk_recall(spark, embeddings):
    from data_engineering_project_capstone_spark.operators.similarity import ivf_topk

    queries = embeddings.filter(F.col("vec_id") < 20)
    exact = cosine_topk(embeddings, queries, k=1).collect()
    approx = ivf_topk(embeddings, queries, k=1, n_cells=8, n_probe=3).collect()
    exact_best = {r["query_id"]: r["neighbor_id"] for r in exact}
    approx_best = {r["query_id"]: r["neighbor_id"] for r in approx}
    hits = sum(1 for q, n in exact_best.items() if approx_best.get(q) == n)
    assert hits / len(exact_best) >= 0.5, f"IVF top-1 recall {hits}/{len(exact_best)}"
    assert set(approx_best) == set(exact_best)


def test_cosine_topk_deterministic(spark, embeddings):
    q = embeddings.filter(F.col("vec_id") == 0)
    a = cosine_topk(embeddings, q, k=5).collect()
    b = cosine_topk(embeddings, q, k=5).collect()
    assert [r["neighbor_id"] for r in a] == [r["neighbor_id"] for r in b]
    cs = [r["cos"] for r in a]
    assert cs == sorted(cs, reverse=True)


def test_lsh_bucket_codegen_guard(spark):
    """Oversized bits×dim configs must fail fast with the fallback named,
    not silently fall off whole-stage codegen (VERDICT r2 advisory)."""
    from data_engineering_project_capstone_spark.operators.similarity import (
        LSH_EXPR_BUDGET,
        lsh_bucket,
    )

    with pytest.raises(ValueError, match="expression budget"):
        lsh_bucket(F.col("embedding"), dim=LSH_EXPR_BUDGET, bits=2)
    # at the budget boundary the unrolled fold is still allowed
    lsh_bucket(F.col("embedding"), dim=LSH_EXPR_BUDGET // 8, bits=8)
    # banded callers must declare the band count: a per-call-affordable
    # config whose bands TOGETHER overrun the plan budget is rejected
    # (ADVICE r4: bands*bits*dim is the real codegen cost in one plan)
    with pytest.raises(ValueError, match="expression budget"):
        lsh_bucket(F.col("embedding"), dim=LSH_EXPR_BUDGET // 8, bits=8, n_calls=2)


def test_banded_dedup_oversized_config_trips_guard(spark):
    """The dedup_embedding_cosine banded path forwards its band count into
    the guard, so an oversized bands×bits×dim config fails fast at plan
    build time instead of stalling codegen."""
    from data_engineering_project_capstone_spark.operators.dedup import (
        embedding_dup_pairs,
    )

    df = spark.createDataFrame(
        [(0, [0.1] * 64), (1, [0.2] * 64)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="expression budget"):
        embedding_dup_pairs(
            df, block_col=None, dim=64, lsh_bits=8, lsh_bands=16
        ).explain()
