"""Similarity search over embedding columns (`array<float>`).

Two paths (BASELINE.json north-star):

- :func:`cosine_topk` — brute-force cosine top-k: broadcast the (small)
  query set against the corpus, rank per query. Exact; the baseline every
  approximate method is measured against. Cost O(|corpus|·|queries|·d)
  spread across executors — fine when |queries| is bounded.
- :func:`lsh_topk` — random-hyperplane LSH: deterministic pseudo-random
  hyperplanes (seeded from xxhash64, no RNG state), sign-bit bucket key,
  search only within the query's bucket (optionally multi-probe by
  hamming-adjacent buckets). The 100 TB path: candidate set shrinks
  ~2^bits-fold, recall tunable by bits/probes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from .dedup import as_double, cosine, dot, norm_of


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine similarity.

    Output: (query_id, rank, neighbor_id, cos). Self-matches excluded.
    Deterministic: ties break on neighbor_id.

    NULL policy (uniform across the ANN family): rows with a NULL vector
    are excluded from both corpus and queries — a NULL embedding is an
    unindexable row, and letting it through yields NULL cosines that rank
    differently across engines (see tests/test_degenerate_embeddings.py).
    """
    corpus = corpus.filter(F.col(vec_col).isNotNull())
    queries = queries.filter(F.col(vec_col).isNotNull())
    # materialize each side's double vector + norm ONCE per row — the
    # |corpus|×|queries| comparison stage is then one dot fold + a scalar
    # division per pair instead of three folds (norm_of's perf contract)
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("q_vec")
    ).withColumn("q_n", norm_of("q_vec"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("c_vec")
    ).withColumn("c_n", norm_of("c_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            ieee_round(
                dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_n") * F.col("c_n")), 6
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"),
                "neighbor_id", "cos")
    )


def _hyperplane(dim: int, plane: int) -> Column:
    """Deterministic pseudo-random hyperplane: component j of plane p is
    a zero-centered value derived from xxhash64(p, j). No RNG state, so
    the same plane is regenerated identically on every executor."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.xxhash64(F.lit(plane), j).cast("double") / F.lit(float(2**63))
        ),
    )


# Expression budget for the unrolled per-bit fold below: each bit expands to
# a zip_with + aggregate over ``dim`` elements, so codegen cost scales with
# bits × dim. 4 bands × 8 bits × dim 16 (the defaults) is measured-fine;
# past this budget Spark falls off whole-stage codegen into interpreted
# evaluation and compile times balloon.
LSH_EXPR_BUDGET = 4096


def lsh_bucket(
    vec: Column, dim: int, bits: int = 8, plane_offset: int = 0, n_calls: int = 1
) -> Column:
    """Sign-bit bucket key: bit p = sign(<vec, hyperplane_{p+plane_offset}>).

    ``plane_offset`` selects an independent hyperplane family — banded
    callers (embedding dedup) use offset ``band*bits`` so each band hashes
    with distinct planes.

    Raises ``ValueError`` when ``n_calls * bits * dim`` exceeds
    ``LSH_EXPR_BUDGET``: the per-bit fold is unrolled into the plan, and
    oversized configs hit Catalyst codegen limits (the same failure mode
    the banded-minhash docstring in dedup.py warns about). Banded callers
    that place several bucket expressions in ONE plan must pass
    ``n_calls=<band count>`` — the budget is a per-PLAN cost, and bands
    multiply it even though each individual call looks affordable. For
    high-dim / many-bit / many-band configs, restructure as
    posexplode(vec) → join against a broadcast (plane, j, component)
    table → groupBy(id, plane) sum → pivot bits, which keeps the work
    row-shaped instead of expression-shaped."""
    total = n_calls * bits * dim
    if total > LSH_EXPR_BUDGET:
        raise ValueError(
            f"lsh_bucket: n_calls*bits*dim = {total} exceeds the codegen "
            f"expression budget ({LSH_EXPR_BUDGET}). Use the explode + "
            "broadcast-plane-join + groupBy formulation for this config "
            "(see docstring)."
        )
    vd = F.transform(vec, lambda x: x.cast("double"))
    key = F.lit(0).cast("long")
    for p in range(bits):
        dot = F.aggregate(
            F.zip_with(vd, _hyperplane(dim, p + plane_offset), lambda x, h: x * h),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        key = key + F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
            F.lit(0).cast("long")
        )
    return key


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF-flat approximate top-k: k-means coarse quantizer (stock
    pyspark.ml KMeans), corpus assigned to its nearest cell, queries probe
    the ``n_probe`` nearest cells and scan only those inverted lists.

    Same output shape as :func:`cosine_topk`. At scale the cell assignment
    is a write-side partition key (one column), so a query touches
    ``n_probe/n_cells`` of the corpus. Centroids train once on a sample.
    NULL-vector rows are excluded from both sides (ANN-family NULL
    policy, see :func:`cosine_topk`) — KMeans.fit crashes outright on a
    NULL feature vector.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    corpus = corpus.filter(F.col(vec_col).isNotNull())
    queries = queries.filter(F.col(vec_col).isNotNull())

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).withColumn("features", array_to_vector(F.col("c_vec").cast("array<double>")))
    # clamp the cell count to the number of DISTINCT vectors: Spark ML
    # KMeans init throws ArrayIndexOutOfBounds when k exceeds the distinct
    # point count (tiny or duplicate-heavy corpora). The distinct count
    # costs one shuffle at fit time only — training is already the
    # expensive step, and at scale the quantizer trains on a sample.
    n_distinct = c.select("c_vec").distinct().count()

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("qd", F.transform(F.col("q_vec"), lambda x: x.cast("double")))

    if n_distinct < 2:
        # 0 or 1 distinct vectors: a coarse quantizer is meaningless and
        # Spark ML KMeans rejects k < 2 outright — one cell holds the
        # whole (possibly empty) corpus and every query probes it.
        # Caught by the empty/all-NULL degenerate net.
        c = c.withColumn("cell", F.lit(0))
        q = q.select(
            "query_id",
            F.col("qd").alias("q_vec"),
            F.lit(0).alias("cell"),
        ).withColumn("q_n", norm_of("q_vec"))
    else:
        km = KMeans(k=min(n_cells, n_distinct), seed=seed, maxIter=10)
        model = km.fit(c.select("features"))
        c = model.transform(c).withColumnRenamed("prediction", "cell")

        centers = [list(map(float, ctr)) for ctr in model.clusterCenters()]

        def _dist2(vec: Column, center: list[float]) -> Column:
            # squared L2 to a literal centroid, sequential fold
            ctr = F.array(*[F.lit(x) for x in center])
            return F.aggregate(
                F.zip_with(vec, ctr, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )

        cell_dists = F.array(
            *[
                F.struct(
                    _dist2(F.col("qd"), ctr).alias("d"), F.lit(i).alias("cell")
                )
                for i, ctr in enumerate(centers)
            ]
        )
        q = (
            q.withColumn("probe", F.slice(F.array_sort(cell_dists), 1, n_probe))
            .select(
                "query_id",
                F.col("qd").alias("q_vec"),
                F.explode(F.col("probe.cell")).alias("cell"),
            )
            .withColumn("q_n", norm_of("q_vec"))
        )
    scored = (
        c.withColumn("c_vec", as_double(F.col("c_vec")))
        .withColumn("c_n", norm_of("c_vec"))
        .join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            ieee_round(
                dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_n") * F.col("c_n")), 6
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"),
                "neighbor_id", "cos")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 8,
    probes: int = 1,
) -> DataFrame:
    """Approximate top-k: restrict the search to the query's LSH bucket,
    multi-probing hamming-adjacent buckets when ``probes`` > 1.

    Same output shape as :func:`cosine_topk`. Recall < 1 by construction;
    tests measure it against the exact baseline. At scale the corpus is
    pre-bucketed once (a write-side partition key), so a query touches
    ``probes · |corpus| / 2^bits`` candidates — the standard recall/cost
    dial (probes=1+bits ≈ doubles recall for ~bits× candidate cost).
    NULL-vector rows are excluded from both sides (ANN-family NULL
    policy, see :func:`cosine_topk`).
    """
    corpus = corpus.filter(F.col(vec_col).isNotNull())
    queries = queries.filter(F.col(vec_col).isNotNull())
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            as_double(F.col(vec_col)).alias("c_vec"),
        )
        .withColumn("c_n", norm_of("c_vec"))
        .withColumn("bucket", lsh_bucket(F.col("c_vec"), dim, bits))
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("q_vec")
        )
        .withColumn("q_n", norm_of("q_vec"))
        .withColumn("bucket", lsh_bucket(F.col("q_vec"), dim, bits))
    )
    if probes > 1:
        # probe the home bucket plus buckets at hamming distance 1
        flips = [F.col("bucket")] + [
            F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(min(probes - 1, bits))
        ]
        q = q.withColumn("bucket", F.explode(F.array(*flips)))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            ieee_round(
                dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_n") * F.col("c_n")), 6
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"),
                "neighbor_id", "cos")
    )
