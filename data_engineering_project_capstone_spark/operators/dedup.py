"""Deduplication operators for LLM-training-data pipelines.

Five dedup families, each a first-class operator (BASELINE.json north-star):

- exact          — hash-groupBy on a normalized fingerprint (one shuffle).
- n-gram Jaccard — min-shingle blocking + in-bucket pairwise Jaccard.
- MinHash + LSH  — k-hash signatures, banded bucketing, candidate join,
                   exact-Jaccard verification.
- SimHash        — 64-bit bit-vote signature + banded hamming candidates.
- embedding      — cosine near-dup over `array<float>` embeddings.

Scale design: every family is {narrow map → shuffle on a blocking key →
in-bucket pairing}. Nothing is O(n²) across the corpus; the quadratic step
is confined to buckets, and bucket size is capped (``max_bucket``) so one
hot bucket can't take down a stage — the standard trade (a pathological
bucket loses recall instead of the job).

All hashing is ``xxhash64`` (JVM, codegen) — Python never touches a row.

Null-text policy (uniform across families): NULL text is normalized to the
empty string ``''`` before fingerprinting/shingling. Consequences: in
:func:`exact_dedup` all null-text and empty-text rows share one fingerprint
and collapse to a single (min-id) survivor; in the pair-producing families
(Jaccard / MinHash / SimHash) an empty document has no shingles or tokens,
so it appears in no near-dup pair — empty-vs-empty duplication is exact-dup
territory, handled by :func:`exact_dedup`, not a similarity question.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from .text import tokens

# --------------------------------------------------------------------------
# Shared: shingling
# --------------------------------------------------------------------------


def shingles_from_tokens(toks: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles from an ALREADY-MATERIALIZED token
    array column. Callers must project the token array first
    (``.select(tokens(...).alias("toks"))``) — referencing a computed
    tokenize expression here would re-evaluate it once per array element
    inside the transform lambda (no common-subexpression elimination
    across higher-order-function boundaries; measured ~10× slower on the
    jaccard family)."""
    c = F.col(toks) if isinstance(toks, str) else toks
    starts = F.sequence(F.lit(1), F.greatest(F.size(c) - F.lit(n - 1), F.lit(1)))
    return F.filter(
        F.array_distinct(
            F.transform(starts, lambda i: F.concat_ws(" ", F.slice(c, i, n)))
        ),
        lambda s: s != "",
    )


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of lowercased text (NULL → '').

    An empty/whitespace-only document has NO shingles (empty array), not a
    [''] singleton — ``split('', '\\s+')`` yields [''] and the final filter
    drops the empty shingle it would produce, so empty docs can never pair
    in any shingle-based family (the documented null policy).

    PERF: this composes the tokenizer INTO the shingle expression, which
    re-tokenizes per array element in the transform lambda. Fine for a
    single scalar use; in any plan that keeps the shingle array, project
    ``tokens(...)`` first and use :func:`shingles_from_tokens`."""
    c = F.col(text) if isinstance(text, str) else text
    return shingles_from_tokens(tokens(F.coalesce(c, F.lit(""))), n)


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------


def normalized_fingerprint(text: Column | str) -> Column:
    """md5 of whitespace-collapsed lowercase text — the exact-dup key.

    NULL text coalesces to '' so null-text rows get a real (shared)
    fingerprint instead of a NULL key that groupBy would still collapse —
    the policy is explicit rather than an accident of NULL grouping."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(
        F.regexp_replace(F.lower(F.trim(F.coalesce(c, F.lit("")))), "\\s+", " ")
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row (min id) per distinct normalized content.

    ONE hash shuffle on the fingerprint: the surviving row travels as a
    ``min_by`` struct through the aggregation, so there is no second
    shuffle to join winners back (the naive groupBy + semi-join plan costs
    two). Map-side partial aggregation collapses duplicate mass before the
    exchange — at 100 TB that is the whole cost model.
    """
    fp = normalized_fingerprint(text_col)
    winner = (
        df.withColumn("_fp", fp)
        .groupBy("_fp")
        .agg(F.min_by(F.struct(*df.columns), F.col(id_col)).alias("_row"))
    )
    return winner.select(*[F.col(f"_row.{c}").alias(c) for c in df.columns])


# --------------------------------------------------------------------------
# n-gram Jaccard with min-shingle blocking
# --------------------------------------------------------------------------


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.2,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-dup pairs by exact Jaccard over word shingles, blocked on the
    minimum shingle hash (MinHash with k=1 as the blocking key).

    Docs with Jaccard ≥ t share their min-shingle with probability ≥ t, so
    blocking on it keeps most true pairs while reducing the cross join to
    within-bucket pairs. Output: (id_a, id_b, jaccard), id_a < id_b.
    """
    sh = (
        df.select(
            F.col(id_col).alias("id"),
            tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("_toks"),
        )
        .select(F.col("id"), shingles_from_tokens("_toks", shingle_n).alias("sh"))
        # non-nullable block key: a nullable join key makes the optimizer
        # infer isnotnull(block) and push the whole shingle expression
        # below the projections (quadratic re-tokenize — see
        # shingles_from_tokens docstring). Empty docs coalesce to a
        # per-row unique sentinel, so they can never co-bucket (null
        # policy) and the key is statically non-null.
        .withColumn(
            "block",
            F.coalesce(
                F.array_min(F.transform(F.col("sh"), lambda s: F.xxhash64(s))),
                F.xxhash64(F.lit("__empty__"), F.coalesce(F.col("id"), F.lit(-1))),
            ),
        )
    )
    sh = sh.withColumn(
        "bsz", F.count(F.lit(1)).over(Window.partitionBy("block"))
    ).filter(F.col("bsz") <= max_bucket)
    a = sh.select(
        F.col("block"), F.col("id").alias("id_a"), F.col("sh").alias("sh_a")
    )
    b = sh.select(
        F.col("block"), F.col("id").alias("id_b"), F.col("sh").alias("sh_b")
    )
    pairs = a.join(b, "block").filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (
        F.size("sh_a").cast("double") + F.size("sh_b").cast("double") - inter
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            ieee_round(inter / F.greatest(union, F.lit(1.0)), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .distinct()
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature: (id, sh, sig array<long>).

    Shape matters: explode shingles then ONE groupBy with k flat min()
    aggregates. The tempting alternative — k nested
    array_min(transform(...)) expressions in a single projection — builds
    an expression tree that takes minutes to codegen-compile and re-walks
    the shingle array k times per row. Exploding costs one shuffle on the
    doc id and keeps every aggregate a flat column op.
    """
    from .layout import spread_scan

    # r18: spread a single-split scan first — the tokenize + shingle +
    # hash work below otherwise fuses into a one-task scan stage on the
    # bench layout (operators/layout.py; no-op on healthy layouts).
    sh = spread_scan(df).select(
        F.col(id_col).alias("id"),
        tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("_toks"),
    ).select(
        F.col("id"),
        # hashed shingles: set semantics survive (xxhash64 collisions are
        # negligible) and downstream set-intersections run on longs, not
        # hundreds of strings — the difference between a cheap verify and
        # a quadratic string-comparison hotspot
        F.array_distinct(
            F.transform(
                shingles_from_tokens("_toks", shingle_n), lambda s: F.xxhash64(s)
            )
        ).alias("sh"),
    )
    ex = sh.select("id", F.explode("sh").alias("s"))
    # r18: the groupBy reconstructs the per-doc shingle SET alongside the
    # k min() aggregates, so the old `sh ⋈ sig` re-attach join — whose
    # probe side re-ran the whole tokenize+shingle pipeline a second
    # time per cold evaluation (no cross-branch CSE) — is gone. Shingle
    # order out of collect_set is nondeterministic, which is immaterial:
    # every consumer reads `sh` through array_intersect/size (set
    # semantics; the entry outputs and their oracle hashes are
    # order-free).
    sig = ex.groupBy("id").agg(
        F.collect_set("s").alias("sh"),
        *[
            F.min(F.xxhash64(F.col("s"), F.lit(i))).alias(f"_h{i}")
            for i in range(num_hashes)
        ],
    )
    return sig.select(
        "id",
        "sh",
        F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("sig"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH, verified by exact
    Jaccard. With 32 hashes in 8 bands of 4 rows, the S-curve crosses ~0.5:
    pairs with J≥0.6 are caught w.p. ≥ 1-(1-0.6⁴)⁸ ≈ 0.70, J≤0.2 w.p. ≈ 1%.

    Pipeline: signature (narrow) → explode bands (×8) → shuffle on
    (band, band_hash) → in-bucket pairing (capped) → exact-Jaccard verify.
    Output: (id_a, id_b, jaccard) with jaccard ≥ threshold.
    """
    rows_per_band = num_hashes // bands
    base = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    base = base.cache()  # sh reused by candidate verify; sig by banding

    band_cols = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.xxhash64(
                    *[
                        F.col("sig").getItem(bi * rows_per_band + r)
                        for r in range(rows_per_band)
                    ]
                ).alias("bhash"),
            )
            for bi in range(bands)
        ]
    )
    # candidates carry ONLY ids: the shingle arrays are wide (hundreds of
    # strings/doc) and must not ride through the band explode, bucket
    # shuffle, and pair dedup — they're joined back once for verification
    buckets = base.select("id", F.explode(band_cols).alias("b")).select(
        "id", F.col("b.band").alias("band"), F.col("b.bhash").alias("bhash")
    )
    # cap pathological buckets (hot-bucket guard: lose recall, not the job)
    bucket_size = F.count(F.lit(1)).over(Window.partitionBy("band", "bhash"))
    buckets = buckets.withColumn("bsz", bucket_size).filter(
        F.col("bsz") <= max_bucket
    )
    a = buckets.select("band", "bhash", F.col("id").alias("id_a"))
    b = buckets.select("band", "bhash", F.col("id").alias("id_b"))
    cand = (
        a.join(b, ["band", "bhash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # two-phase verify: (1) cheap signature-match estimate (k long
    # comparisons) culls the candidate flood, (2) exact Jaccard on hashed
    # shingles only for survivors. On shared-vocabulary corpora the LSH
    # buckets are dense, so phase 1 is what keeps this linear in practice.
    sig = base.select("id", "sig")
    cand = cand.join(
        sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")), "id_a"
    ).join(sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")), "id_b")
    matches = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    est = matches.cast("double") / F.lit(float(num_hashes))
    # E[est] = true Jaccard; keep a loose margin so phase 2 decides
    survivors = cand.withColumn("est", est).filter(
        F.col("est") >= threshold * 0.5
    ).select("id_a", "id_b")

    sh = base.select("id", "sh")
    survivors = survivors.join(
        sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
    ).join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size("sh_a").cast("double") + F.size("sh_b").cast("double") - inter
    return survivors.select(
        "id_a",
        "id_b",
        ieee_round(inter / F.greatest(union, F.lit(1.0)), 4).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
) -> DataFrame:
    """Per-doc SimHash signature: (id, sig long).

    Each distinct token votes ±1 per bit of its xxhash64; the signature
    takes the sign of each bit's vote sum. Same shape rationale as
    :func:`minhash_signatures`: explode + one flat groupBy (60 sums),
    not a 60-deep nested-aggregate expression. 60 bits keeps the numeric
    fold inside signed-long range.
    """
    from .layout import spread_scan

    ex = (
        # r18: spread a single-split scan so the tokenize/explode below
        # runs at session parallelism (no-op on healthy layouts)
        spread_scan(df).select(
            F.col(id_col).alias("id"),
            F.explode(
                F.array_distinct(tokens(F.coalesce(F.col(text_col), F.lit(""))))
            ).alias("tok"),
        )
        # empty docs tokenize to [''] — drop it so they carry no signature
        # and therefore never pair (uniform null policy)
        .filter(F.col("tok") != "")
        .withColumn("h", F.xxhash64("tok"))
    )
    votes = ex.groupBy("id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"_v{i}")
            for i in range(bits)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig + F.when(
            F.col(f"_v{i}") > 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return votes.select("id", sig.alias("sig"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    bands: int = 4,
    sig_df: DataFrame | None = None,
) -> DataFrame:
    """Near-dup candidates by SimHash hamming distance, blocked on 15-bit
    signature bands (a pair with hamming ≤ bands-1 over the 60 signature
    bits must match at least one band exactly — pigeonhole). Output:
    (id_a, id_b, hamming) with hamming ≤ max_hamming.

    ``sig_df``: optional precomputed (id, sig) signature table. The band
    self-join evaluates its input ONCE PER SIDE, so an unmaterialized
    signature plan runs twice; at scale, materialize signatures first
    (localCheckpoint or a parquet write) and pass them here — the catalog
    entries do exactly this via a session-scoped memo."""
    sig = sig_df if sig_df is not None else simhash_signatures(df, text_col, id_col)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.shiftright(F.col("sig"), bi * 15)
                .bitwiseAND(F.lit((1 << 15) - 1))
                .alias("bkey"),
            )
            for bi in range(bands)
        ]
    )
    exploded = sig.select("id", "sig", F.explode(band_structs).alias("b")).select(
        "id", "sig", F.col("b.band").alias("band"), F.col("b.bkey").alias("bkey")
    )
    a = exploded.select("band", "bkey", F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = exploded.select("band", "bkey", F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(b, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", ham.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


# --------------------------------------------------------------------------
# Embedding cosine near-dup
# --------------------------------------------------------------------------


def as_double(v: Column) -> Column:
    """Cast an array<float> column to array<double> (fold precision)."""
    return F.transform(v, lambda x: x.cast("double"))


def norm_of(vd: Column | str) -> Column:
    """Euclidean norm of a double-array column, floored at 1e-6 —
    sequential left fold, the op order DuckDB's list_reduce uses.

    PERF CONTRACT: materialize this as its OWN column per row BEFORE any
    pairwise join, then compare pairs with ``dot(a,b)/(n_a*n_b)`` — one
    fold per candidate pair instead of three (a measured 3× on the
    in-bucket stage). Do NOT divide the vector elements by the norm
    inside a transform lambda: the norm sub-expression is re-evaluated
    per element there (no CSE across HOF boundaries), turning an O(d)
    row cost into O(d²)."""
    c = F.col(vd) if isinstance(vd, str) else vd
    return F.greatest(
        F.sqrt(
            F.aggregate(
                F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
            )
        ),
        F.lit(1e-6),
    )


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two double-array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<float> columns, computed as a
    sequential left fold in double — the op order DuckDB's list_reduce
    uses, so oracle results are bit-comparable.

    Scalar convenience form — for pairwise joins use
    normalize-then-:func:`dot` (see the normalize docstring)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    d = F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(
        F.aggregate(F.transform(ad, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    nb = F.sqrt(
        F.aggregate(F.transform(bd, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    return d / F.greatest(na * nb, F.lit(1e-12))


def embedding_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = "label",
    threshold: float = 0.95,
    dim: int = 64,
    lsh_bits: int = 8,
    lsh_bands: int = 4,
    allow_all_pairs: bool = False,
) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold, blocked on
    ``block_col`` (a cluster/label column). With ``block_col=None`` the
    blocking key defaults to BANDED random-hyperplane LSH
    (:func:`..operators.similarity.lsh_bucket`, ``lsh_bands`` independent
    ``lsh_bits``-bit bucket keys; a pair is a candidate if ANY band
    agrees) — at 100 TB there is no curated label column, and an
    unblocked crossJoin is corpus-quadratic. Per-band same-bucket
    probability at cosine c is (1 - arccos(c)/π)^bits (~0.75 for c=0.95,
    8 bits); banding lifts recall to 1-(1-p)^bands (~0.996 for 4 bands) —
    measured against all-pairs in tests. All-pairs is an explicit opt-in:
    ``allow_all_pairs=True`` — small inputs only.

    Output: (id_a, id_b, cos) with id_a < id_b. Cost of banding is a
    ``lsh_bands``× explode of the id+vector projection before the bucket
    join, and a post-join dropDuplicates on (id_a, id_b) — both linear.
    """
    # NULL-vector rows are excluded (ANN-family NULL policy,
    # similarity.cosine_topk): an unindexable row can never pair.
    df = df.filter(F.col(vec_col).isNotNull())
    # materialize the double vector AND its norm once per row: every
    # downstream pair comparison is one dot fold + a scalar division
    # (see norm_of's perf contract — 3x cheaper on the in-bucket stage)
    cols = [
        F.col(id_col).alias("id"),
        as_double(F.col(vec_col)).alias("v"),
    ]
    if block_col:
        cols.append(F.col(block_col).alias("block"))
    base = df.select(*cols).withColumn("vn", norm_of("v"))
    banded = not block_col and not allow_all_pairs
    if banded:
        from .similarity import lsh_bucket

        bands = F.array(
            *[
                F.struct(
                    F.lit(bi).alias("band"),
                    lsh_bucket(
                        F.col("v"),
                        dim,
                        lsh_bits,
                        plane_offset=bi * lsh_bits,
                        n_calls=lsh_bands,
                    ).alias("bkt"),
                )
                for bi in range(lsh_bands)
            ]
        )
        base = base.withColumn("block", F.explode(bands))
        block_col = "_lsh"  # truthy marker: base now carries `block`
    join_keys = ["block"] if block_col else []
    a = base.select(
        *(["block"] if block_col else []),
        F.col("id").alias("id_a"),
        F.col("v").alias("v_a"),
        F.col("vn").alias("n_a"),
    )
    b = base.select(
        *(["block"] if block_col else []),
        F.col("id").alias("id_b"),
        F.col("v").alias("v_b"),
        F.col("vn").alias("n_b"),
    )
    # r18: the bench corpus arrives as a single parquet split (one row
    # group) and the build side of the block join broadcasts, so the
    # whole scan → join → pairwise-fold pipeline fused into ONE task at
    # sf0.1 — ~1.6s of interpreted 64-d dot folds on one core with 31
    # idle. Re-spread the PROBE side only (corpus-linear id+vector+norm
    # rows) across the session parallelism: measured 1.61s → 0.56s for
    # the fold stage. The build side is deliberately NOT repartitioned —
    # hanging its broadcast off the exchange serializes the build behind
    # the shuffle and measured SLOWER than the 1-task baseline. Guide
    # §2.5's unsplittable-input remedy, gated through spread_scan
    # (r19): the re-spread fires ONLY when the probe layout is below
    # session parallelism — on a healthy many-partition layout at scale
    # it is an exact no-op, never a coalescing exchange. Row placement
    # does not affect results (same pair set, same per-pair arithmetic).
    from .layout import spread_scan

    a = spread_scan(a)
    pairs = (a.join(b, join_keys) if join_keys else a.crossJoin(b)).filter(
        F.col("id_a") < F.col("id_b")
    )
    if banded:
        # a pair that agrees in several bands appears once per band; the
        # duplicate rows are identical apart from the band key
        pairs = pairs.dropDuplicates(["id_a", "id_b"])
    return pairs.select(
        "id_a",
        "id_b",
        ieee_round(
            dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")), 6
        ).alias("cos"),
    ).filter(F.col("cos") >= threshold)
