"""Round-6h catalog entries — exact set-similarity join and graph/basket
co-occurrence analytics:

- ``simjoin_prefix``: EXACT shingle-Jaccard self-join at θ=0.6 via
  prefix filtering (the AllPairs/PPJoin candidate-generation family).
  Unlike the MinHash/min-shingle-blocking dedup entries (probabilistic
  — they can miss pairs), prefix filtering is LOSSLESS: order each
  doc's shingles by ascending global frequency and only the first
  ``s − ⌈θ·s⌉ + 1`` of them can witness a qualifying pair, so an
  equi-join on prefix shingles generates every candidate. The oracle
  SQL is deliberately the NAIVE exact formulation (all shared-shingle
  pairs, no filter) — a hash match proves the pruning loses nothing.
- ``graph_triangles``: triangle counts + local clustering coefficient
  on the part co-order graph (parts are linked when some order buys
  both), using degree orientation — every edge points from the
  (degree, id)-smaller endpoint to the larger, so each triangle is
  enumerated exactly once from its smallest corner and the wedge join
  fans out on out-degree ≤ √(2|E|) instead of raw degree.
- ``basket_lift``: association rules over per-order brand baskets —
  directional support / confidence / lift, the market-basket readout
  (token-level PMI's transaction-level sibling).

Float parity: the θ decision uses INTEGER arithmetic on both engines
(``5·inter ≥ 3·union`` for θ = 3/5; prefix length via integer
ceil-division ``(3s+4) DIV 5``) so no IEEE boundary can ever disagree
about membership; floats appear only in the final rounded readout
columns. Same contract as ``plans.catalog`` otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from ..operators.dedup import shingles_from_tokens
from ..operators.lineage import materialize
from ..operators.text import tokens
from .catalog import Entry, sql_ieee_round, t

# ---------------------------------------------------------------------------
# 1. Prefix-filtered exact similarity self-join
# ---------------------------------------------------------------------------

# θ = 3/5. Kept as a ratio so every threshold decision is integer math.
_SJ_NUM, _SJ_DEN = 3, 5


def simjoin_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All document pairs with 3-shingle Jaccard ≥ 0.6, found by prefix
    filtering (rare-shingle-first ordering), verified exactly.

    Scale shape: one shingle-keyed shuffle join attaches global
    frequencies (data × vocab, co-partitioned), one groupBy rebuilds
    the per-doc array sorted rare-first, and the candidate join
    explodes only the prefix — ~(1−θ)·s shingles per doc instead of s,
    and each prefix shingle is globally RARE by construction, so
    candidate buckets stay small exactly where a naive shared-shingle
    join blows up (a stopword shingle shared by every doc lands in
    nobody's prefix once s is large). The verify stage re-joins the
    full sorted arrays and intersects them (xxhash64-hashed since r18 —
    sizes are hash-invariant); the θ test is
    ``5·inter ≥ 3·union`` in integers, so both engines make identical
    keep/drop decisions. Length filter ``5·min(sa,sb) ≥ 3·max(sa,sb)``
    prunes candidates before the distinct.

    Empty/NULL docs have zero shingles (engine-wide null policy) and
    vanish at the explode on both sides.

    Plan-reuse note: the prefix explode AND both verify sides all hang
    off the ONE ``ordered`` groupBy — its output Exchange is structurally
    identical at every consumption site, so the physical plan reuses it
    (ReusedExchange) instead of re-deriving the shingle pipeline per
    branch (Spark does no cross-branch common-subexpression elimination;
    re-deriving was measured at ~2× the whole entry). Verification
    intersects the rarity-SORTED arrays directly — intersection size is
    order-independent, so no second canonical-order array is needed."""
    # r18: hash each shingle to int64 AT the explode — every downstream
    # stage (the frequency groupBy, the rarity sort, the prefix
    # candidate join and the verify intersect) then moves and compares
    # 8-byte longs instead of ~20-char strings (verify stage measured
    # 11.7s → 2.2s task time at sf0.1). The prefix-filter guarantee
    # ("every θ-pair shares a prefix shingle") holds for ANY consistent
    # global rarity order, so re-ordering hash ties cannot change the
    # verified pair set, and intersection/union SIZES are
    # hash-invariant — the same xxhash64 trade dedup_jaccard_pairs
    # documents (a 64-bit in-pair collision is ~s²/2⁶⁴ and would only
    # nudge one jaccard value; the string-exact oracle differential
    # guards it). NOTE: no spread_scan here — the tokenize hangs below
    # the reused hashpartitioning(s3) exchange, and inserting a
    # round-robin exchange under it broke the reuse (tokenize ran once
    # per branch, measured 2× the stage CPU).
    docs = t(spark, sf_dir, "documents")
    tk = (
        docs.select(
            F.col("doc_id").alias("id"),
            tokens(F.coalesce(F.col("text"), F.lit(""))).alias("_toks"),
        )
        .select("id", F.explode(shingles_from_tokens("_toks", 3)).alias("_s3"))
        .select("id", F.xxhash64("_s3").alias("s3"))
    )
    dfr = tk.groupBy("s3").agg(F.count("*").alias("dfc"))
    ordered = (
        tk.join(dfr, "s3")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list(F.struct("dfc", "s3"))).alias("osh"))
        .select(
            "id",
            F.transform("osh", lambda x: x["s3"]).alias("osh"),
            F.size("osh").alias("s"),
        )
    )
    # prefix length p = s − ⌈θ·s⌉ + 1, integer ceil-division (θ = 3/5)
    p = F.col("s") - F.expr(f"(s * {_SJ_NUM} + {_SJ_DEN - 1}) div {_SJ_DEN}") + 1
    pref = ordered.select(
        "id", "s", F.explode(F.slice("osh", F.lit(1), p)).alias("s3")
    )
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.s3") == F.col("b.s3"))
            & (F.col("a.id") < F.col("b.id"))
            # length filter: Jaccard ≥ θ requires θ·max(sa,sb) ≤ min(sa,sb)
            & (
                F.least("a.s", "b.s") * _SJ_DEN
                >= F.greatest("a.s", "b.s") * _SJ_NUM
            ),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    fa = ordered.select(F.col("id").alias("id_a"), F.col("osh").alias("sha"))
    fb = ordered.select(F.col("id").alias("id_b"), F.col("osh").alias("shb"))
    inter = F.size(F.array_intersect("sha", "shb"))
    union = F.size("sha") + F.size("shb") - inter
    return (
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .select(
            "id_a",
            "id_b",
            inter.alias("_i"),
            union.alias("_u"),
        )
        .filter(F.col("_i") * _SJ_DEN >= F.col("_u") * _SJ_NUM)
        .select(
            "id_a",
            "id_b",
            ieee_round(F.col("_i") / F.col("_u"), 4).alias("jaccard"),
        )
        .orderBy("id_a", "id_b")
    )


# The oracle is the NAIVE exact join — every pair sharing ANY shingle,
# θ-filtered with the same integer test. Any pair the prefix filter
# missed (or invented) breaks the hash match, so correctness of the
# pruning is what the differential actually certifies.
SIMJOIN_PREFIX_SQL = f"""
WITH sh AS (
    SELECT doc_id AS id, shingles
    FROM (
        SELECT doc_id,
               list_filter(list_distinct(list_transform(
                   range(1, greatest(len(toks) - 2, 1) + 1),
                   i -> array_to_string(toks[i:i+2], ' '))),
                   s -> s <> '') AS shingles
        FROM (SELECT doc_id,
                     string_split_regex(lower(trim(coalesce(text, ''))), '[ \\t\\n\\x0b\\f\\r]+') AS toks
              FROM documents)
    )
    WHERE len(shingles) > 0
),
tk AS (SELECT id, unnest(shingles) AS s3 FROM sh),
sizes AS (SELECT id, len(shingles) AS s FROM sh),
inter AS (
    SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
    FROM tk a JOIN tk b ON a.s3 = b.s3 AND a.id < b.id
    GROUP BY 1, 2
),
j AS (
    SELECT id_a, id_b, i, sa.s + sb.s - i AS u
    FROM inter
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
)
SELECT id_a, id_b, {sql_ieee_round("i * 1.0 / u", 4)} AS jaccard
FROM j
WHERE i * {_SJ_DEN} >= u * {_SJ_NUM}
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# 2. Degree-oriented triangle counting
# ---------------------------------------------------------------------------

_TRI_TOP_K = 20


def _triangle_oriented_adj(spark: SparkSession, sf_dir: str):
    """(e, deg, dir_e, adj) for the co-order part graph — the
    degree-oriented skeleton shared by graph_triangles and the
    bounded-out-degree test, so the test exercises the REAL collected
    arrays, not a model of them."""
    # NULL-key discipline matches the replaced self-join and the SQL
    # oracle (a = b never matches NULL): a NULL orderkey must not form a
    # "basket of unknowns", so filter it; NULL partkeys are dropped by
    # collect_set below, same as pa < pb dropped them in the join form.
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey").isNotNull())
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
    )
    # Co-order pairs via per-basket array combinations, not a self-join:
    # ONE groupBy shuffle on ok (collect_set dedupes (ok,pk) in the same
    # pass, absorbing the old pre-distinct shuffle), then all i<j pairs
    # generated JVM-side from the sorted basket array — fan-out bounded
    # by basket size squared (≤ ~21² for TPC-H orders), independent of
    # data volume, exactly like the pair generator's contract below.
    # Replaces distinct + self-join (two fact shuffles + doubled scan);
    # measured r8 at sf0.1, settled 3-rep: 1.27s vs 1.52s for the join
    # form on edge generation, same 1,196,000-pair output.
    baskets = li.groupBy("ok").agg(F.sort_array(F.collect_set("pk")).alias("pks"))
    e = (
        baskets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("pks"),
                        lambda x, i: F.transform(
                            F.slice(F.col("pks"), i + F.lit(2), F.size("pks")),
                            lambda y: F.struct(x.alias("pa"), y.alias("pb")),
                        ),
                    )
                )
            ).alias("_e")
        )
        .select("_e.pa", "_e.pb")
        .distinct()
    )
    # e feeds 3 consumers (degree agg + the orientation join).
    # ReusedExchange dedupes them on warm plans, but the cold first run
    # re-derives the pair join per consumer (measured 13.9s vs 6.1s at
    # sf0.1) — cut the lineage once, as core_peel does.
    e = e.localCheckpoint()
    # r18: deg is node-count-sized but its map side reads the e
    # checkpoint TWICE (the symmetric union), and it has three
    # consumers (both orientation sides + the readout join) — the
    # readout's copy was measured re-running the whole 2×|e| union agg.
    # One more one-shot cut: consumers read ~20k rows instead.
    deg = (
        e.select(F.col("pa").alias("v"))
        .unionAll(e.select(F.col("pb").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    ).localCheckpoint()
    dega = deg.select(F.col("v").alias("pa"), F.col("d").alias("da"))
    degb = deg.select(F.col("v").alias("pb"), F.col("d").alias("db"))
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("pa") < F.col("pb"))
    )
    dir_e = (
        e.join(dega, "pa")
        .join(degb, "pb")
        .select(
            F.when(lower_first, F.col("pa")).otherwise(F.col("pb")).alias("src"),
            F.when(lower_first, F.col("pb")).otherwise(F.col("pa")).alias("dst"),
        )
    )
    # r18: cut at ADJ, not at dir_e. The edge list and the adjacency
    # carry the same information, but a checkpointed 1.2M-row dir_e is
    # ~190 MB of row objects that its three consumers (both adjacency
    # builds + the per-edge stream) each re-read in full (measured);
    # the grouped adjacency is ~20k array rows (~15 MB). So materialize
    # adj once and REGENERATE the directed edge stream by exploding it
    # — identical (src, dst) set, 12× fewer bytes per consumer read,
    # one fewer checkpoint.
    adj = (
        dir_e.groupBy(F.col("src").alias("v"))
        .agg(F.sort_array(F.collect_list("dst")).alias("outs"))
    ).localCheckpoint()
    from ..operators.layout import spread_scan

    # the re-exploded stream inherits the checkpoint's few partitions at
    # bench scale, starving the downstream per-edge intersect of cores —
    # spread it (no-op when adj already has ≥ default-parallelism
    # partitions, as any at-scale layout does)
    dir_e = spread_scan(
        adj.select(F.col("v").alias("src"), F.explode("outs").alias("dst"))
    )
    return e, deg, dir_e, adj


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K parts by triangle participation in the co-order graph,
    with degree and local clustering coefficient 2T/(d(d−1)).

    Scale shape: DEGREE-ORIENTED per-edge intersection. Each undirected
    edge is oriented toward the higher (degree, id) endpoint, so a
    node's collected out-list holds only neighbors of ≥ its own rank —
    out-degree is bounded by O(√(2E)) regardless of the real degree
    distribution (a node with k out-neighbors implies k nodes of
    degree ≥ k, hence E ≥ k²/2). The unoriented form collected FULL
    neighbor lists, making a degree-d hub a single d-element array row
    — a memory bomb for any celebrity node at 100 TB. Each triangle
    {a<b<c} (rank order) is discovered exactly once, at its lowest
    edge (a→b) with c ∈ out(a)∩out(b); total intersection work drops
    from Σd² wedges to the arboricity-bounded Σ min-rank-degree. Corner
    credit: src and dst of the discovering edge each gain t_e, and each
    witness c gains 1 via an explode whose total row count is exactly
    the triangle count (not the wedge count). The co-order pair
    generator itself fans out per order on basket size squared
    (≤ ~21 for TPC-H orders), not data volume.

    Measured at sf0.1 (local[32], warm, 3 reps): 6.4s shuffle-join
    form (this code) vs 3.7s with F.broadcast(deg)+F.broadcast(adj).
    The broadcast form is rejected as the default: adj totals O(E)
    bytes (every directed edge appears in exactly one out-list), so it
    only broadcasts while the whole edge list fits on one executor —
    the opposite of the 100 TB posture. AQE's runtime shuffle→broadcast
    conversion picks up the win automatically on clusters where the
    adjacency side lands under the threshold; sf0.1's ~15 MB is just
    over the 10 MB default, which is the correct call to leave alone.

    r19 leave-alone verdict on the residual intersect (the r18 ledger's
    "biggest single compute left", ~132M element-ops): three rewrites
    were built, proven result-identical on the full per_node output,
    and all MEASURED SLOWER in one interleaved session (warm noop-sink
    reps, corners→per_node subplan): JVM array_intersect (this code)
    1.17–1.28s · mapInArrow batched merge-intersect (pandas merge on
    the flattened (row, value) streams — guide §4.2) 9.4–10.4s, the
    Arrow boundary ships all 132M array elements · dir_e⋈dir_e⋈dir_e
    path-join (a→b→c then probe (a,c); no arrays at all) 7.8–8.0s, the
    49.2M-row path table pays a full sort-merge exchange. The
    hash-per-row JVM intersect on arrays that ride one exchange is the
    measured optimum; skeleton variants (serialized checkpoint storage
    for e/adj; deg from one explode instead of the 2-read union) also
    measured flat-to-worse (interleaved mins 4.67s current vs 5.47s
    serialized) and are left alone."""
    e, deg, dir_e, adj = _triangle_oriented_adj(spark, sf_dir)
    sa = adj.select(F.col("v").alias("src"), F.col("outs").alias("outs_s"))
    sb = adj.select(F.col("v").alias("dst"), F.col("outs").alias("outs_d"))
    # inner joins are lossless for counting: a dst with no out-edges
    # has an empty out-list, so its intersections are empty anyway.
    # Attach outs_d BEFORE outs_s (r18): whichever array is attached
    # first rides the second join's shuffle, and Σ_e |outs(dst)| =
    # Σ_v outdeg·indeg (49.2M elements at sf0.1) is 41% smaller than
    # Σ_e |outs(src)| = Σ_v outdeg² (83.4M) under the degree
    # orientation — same rows, same intersections, smaller exchange.
    per_edge = (
        dir_e.join(sb, "dst")
        .join(sa, "src")
        .select(
            "src",
            "dst",
            F.array_intersect("outs_s", "outs_d").alias("wit"),
        )
    )
    # r18: per-node credits from the exploded WITNESS rows alone. The
    # old shape unioned three per_edge readers ((src, t_e), (dst, t_e),
    # (witness, 1)) — each branch re-derived the join+intersect pipeline
    # (no cross-branch CSE; the collapsed t_e filter even re-evaluated
    # the intersect inside the join condition), and a lineage cut that
    # fixed the re-derivation materialized 1.2M witness-array rows that
    # every branch then re-read (~190 MB of block reads per branch,
    # measured). Observation: t_e IS the number of witness rows of the
    # edge, so one row per (edge, witness) crediting src, dst and the
    # witness once each reproduces the exact same per-node sums —
    # corner credit src += t_e and dst += t_e arrives as t_e unit
    # credits. One pass, one explode (empty intersections vanish, which
    # was the old t_e > 0 filter), one triangle-count-sized exchange,
    # no checkpoint, intersect evaluated exactly once per edge
    # (single reference inside the generator input).
    corners = per_edge.select("src", "dst", F.explode("wit").alias("c"))
    per_node = (
        corners.select(F.explode(F.array("src", "dst", "c")).alias("v"))
        .groupBy("v")
        .agg(F.count("*").cast("long").alias("tri"))
    )
    return (
        per_node.join(deg, "v")
        .select(
            F.col("v").alias("part_key"),
            F.col("d").cast("long").alias("degree"),
            F.col("tri").cast("long").alias("triangles"),
            ieee_round(
                F.lit(2.0) * F.col("tri") / (F.col("d") * (F.col("d") - 1)), 6
            ).alias("clustering_coeff"),
        )
        .orderBy(F.desc("triangles"), "part_key")
        .limit(_TRI_TOP_K)
    )


GRAPH_TRIANGLES_SQL = f"""
WITH li AS (
    SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
),
e AS (
    SELECT DISTINCT a.pk AS pa, b.pk AS pb
    FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
),
deg AS (
    SELECT v, count(*) AS d
    FROM (SELECT pa AS v FROM e UNION ALL SELECT pb FROM e)
    GROUP BY v
),
dir_e AS MATERIALIZED (
    SELECT CASE WHEN (da.d, e.pa) < (db.d, e.pb) THEN e.pa ELSE e.pb END AS src,
           CASE WHEN (da.d, e.pa) < (db.d, e.pb) THEN e.pb ELSE e.pa END AS dst,
           CASE WHEN (da.d, e.pa) < (db.d, e.pb) THEN db.d ELSE da.d END AS degd
    FROM e
    JOIN deg da ON da.v = e.pa
    JOIN deg db ON db.v = e.pb
),
tri AS MATERIALIZED (
    SELECT w1.src AS a, w1.dst AS x, w2.dst AS y
    FROM dir_e w1
    JOIN dir_e w2 ON w1.src = w2.src
                 AND (w1.degd, w1.dst) < (w2.degd, w2.dst)
    JOIN dir_e c ON c.src = w1.dst AND c.dst = w2.dst
),
per_node AS (
    SELECT v, count(*) AS tri
    FROM (SELECT a AS v FROM tri UNION ALL SELECT x FROM tri
          UNION ALL SELECT y FROM tri)
    GROUP BY v
)
SELECT p.v AS part_key,
       CAST(deg.d AS BIGINT) AS degree,
       CAST(p.tri AS BIGINT) AS triangles,
       {sql_ieee_round("2.0 * p.tri / (deg.d * (deg.d - 1))", 6)}
           AS clustering_coeff
FROM per_node p JOIN deg ON deg.v = p.v
ORDER BY triangles DESC, part_key
LIMIT {_TRI_TOP_K}
"""


# ---------------------------------------------------------------------------
# 3. Market-basket association rules (brand baskets)
# ---------------------------------------------------------------------------

# relative minimum support: a rule must appear in ≥ 1/_BL_SUPPORT_DEN of
# all baskets (0.5%). Relative, not absolute, so the rule set is
# SF-stable; the test is integer (sab·den ≥ n) on both engines.
_BL_SUPPORT_DEN = 200
_BL_TOP_K = 20


def basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K directional brand association rules by lift over per-order
    baskets: support(a→b), confidence(a→b) = s(ab)/s(a), and
    lift = n·s(ab)/(s(a)·s(b)), with a relative minimum-support floor.

    Scale shape: baskets come from one lineitem × part key join
    (UN-hinted: part scales with SF, so the planner/AQE must choose
    broadcast only where stats say it fits — a forced broadcast of the
    full part projection is driver OOM at the 100 TB design point)
    plus a distinct; the pair count is a self-join on the order key
    where the per-order fan-out is bounded by basket size squared
    (brands per order, ≤ a few dozen), not by data volume. Brand
    marginals are a 25-row aggregate joined back via broadcast (the
    brand domain is an enum — genuinely bounded); the grand total
    rides a 1-row broadcast crossJoin. Ordering is by
    the ROUNDED lift so both engines sort identical doubles, ties by
    (brand_a, brand_b)."""
    part = t(spark, sf_dir, "part").select(
        F.col("p_partkey"), F.col("p_brand")
    )
    # a NULL orderkey is not a basket: count(DISTINCT ok) skips NULL on
    # the SQL side, so the Spark side must drop those rows too (and they
    # must not inflate brand marginals). Caught by the degenerate-
    # lineitem net's NULL-orderkey rows.
    bk = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey").isNotNull())
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("b"))
        .distinct()
    )
    n = bk.select("ok").distinct().agg(F.count("*").alias("n"))
    marg = bk.groupBy("b").agg(F.count("*").alias("s"))
    xa, xb = bk.alias("xa"), bk.alias("xb")
    pair = (
        xa.join(
            xb,
            (F.col("xa.ok") == F.col("xb.ok")) & (F.col("xa.b") != F.col("xb.b")),
        )
        .groupBy(
            F.col("xa.b").alias("brand_a"), F.col("xb.b").alias("brand_b")
        )
        .agg(F.count("*").alias("sab"))
    )
    ma = marg.select(F.col("b").alias("brand_a"), F.col("s").alias("sa"))
    mb = marg.select(F.col("b").alias("brand_b"), F.col("s").alias("sb"))
    return (
        pair.join(F.broadcast(ma), "brand_a")
        .join(F.broadcast(mb), "brand_b")
        .crossJoin(F.broadcast(n))
        .filter(F.col("sab") * _BL_SUPPORT_DEN >= F.col("n"))
        .select(
            "brand_a",
            "brand_b",
            F.col("sab").cast("long").alias("support_count"),
            ieee_round(F.col("sab") / F.col("n"), 6).alias("support"),
            ieee_round(F.col("sab") / F.col("sa"), 6).alias("confidence"),
            ieee_round(
                F.col("sab") * F.col("n") / (F.col("sa") * F.col("sb")), 6
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "brand_a", "brand_b")
        .limit(_BL_TOP_K)
    )


BASKET_LIFT_SQL = f"""
WITH bk AS (
    SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_orderkey IS NOT NULL
),
n AS (SELECT count(DISTINCT ok) AS n FROM bk),
marg AS (SELECT b, count(*) AS s FROM bk GROUP BY b),
pair AS (
    SELECT a.b AS brand_a, x.b AS brand_b, count(*) AS sab
    FROM bk a JOIN bk x ON a.ok = x.ok AND a.b <> x.b
    GROUP BY 1, 2
)
SELECT brand_a, brand_b,
       CAST(sab AS BIGINT) AS support_count,
       {sql_ieee_round("sab * 1.0 / n.n", 6)} AS support,
       {sql_ieee_round("sab * 1.0 / ma.s", 6)} AS confidence,
       {sql_ieee_round("sab * 1.0 * n.n / (ma.s * mb.s)", 6)} AS lift
FROM pair
JOIN marg ma ON ma.b = brand_a
JOIN marg mb ON mb.b = brand_b
CROSS JOIN n
WHERE sab * {_BL_SUPPORT_DEN} >= n.n
ORDER BY lift DESC, brand_a, brand_b
LIMIT {_BL_TOP_K}
"""


# ---------------------------------------------------------------------------
# 4. Core peeling (graph trimming)
# ---------------------------------------------------------------------------


def graph_core_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two peel rounds toward the k-core of the co-order graph with a
    DATA-ADAPTIVE threshold k = ⌈avg degree⌉ (exact integer
    ceil-division, so both engines pick the identical k): each round
    drops nodes whose CURRENT degree < k and induces the subgraph.
    Readout is the shrinkage ledger — (round, nodes, edges) for rounds
    0/1/2 — the compact, SF-stable signature of the trim.

    This is the bounded-round form of the k-core/degeneracy peel used
    to shrink graphs before quadratic passes (the unbounded form
    iterates to fixpoint with localCheckpoint lineage cuts, exactly
    like operators/clusters.py's label propagation). Each round is one
    degree aggregation plus two semi-joins — no wedge work, no
    materialized candidate sets; everything is integer counts."""
    li = (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    la, lb = li.alias("la"), li.alias("lb")
    e0 = (
        la.join(
            lb,
            (F.col("la.ok") == F.col("lb.ok")) & (F.col("la.pk") < F.col("lb.pk")),
        )
        .select(F.col("la.pk").alias("pa"), F.col("lb.pk").alias("pb"))
        .distinct()
    )
    # 3 consumers per round; cut the pair join. Peel-loop cuts route
    # through lineage.materialize (r14): reliable checkpoint when a
    # checkpoint dir is set, localCheckpoint fallback otherwise.
    e0 = materialize(e0)

    def degrees(e: DataFrame) -> DataFrame:
        return (
            e.select(F.col("pa").alias("v"))
            .unionAll(e.select(F.col("pb").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("d"))
        )

    def peel(e: DataFrame, k_col: DataFrame) -> DataFrame:
        surv = (
            degrees(e)
            .crossJoin(F.broadcast(k_col))
            .filter(F.col("d") >= F.col("k"))
            .select("v")
        )
        return materialize(
            e.join(surv.select(F.col("v").alias("pa")), "pa", "left_semi")
            .join(surv.select(F.col("v").alias("pb")), "pb", "left_semi")
        )

    deg0 = degrees(e0)
    # k = ceil(2|E| / |V|) in exact integer arithmetic
    k_col = (
        deg0.agg(
            F.sum("d").alias("two_e"), F.count("*").alias("n_v")
        ).select(
            F.expr("cast((two_e + n_v - 1) div n_v as int)").alias("k")
        )
    )
    e1 = peel(e0, k_col)
    e2 = peel(e1, k_col)

    def ledger(rnd: int, e: DataFrame) -> DataFrame:
        return e.agg(
            F.lit(rnd).alias("round"),
            F.count("*").cast("long").alias("edges"),
        ).crossJoin(
            F.broadcast(degrees(e).agg(F.count("*").cast("long").alias("nodes")))
        ).select("round", "nodes", "edges")

    return (
        ledger(0, e0).unionAll(ledger(1, e1)).unionAll(ledger(2, e2))
        .orderBy("round")
    )


GRAPH_CORE_PEEL_SQL = """
WITH li AS (
    SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
),
e0 AS (
    SELECT DISTINCT a.pk AS pa, b.pk AS pb
    FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
),
deg0 AS (
    SELECT v, count(*) AS d
    FROM (SELECT pa AS v FROM e0 UNION ALL SELECT pb FROM e0) GROUP BY v
),
kk AS (
    SELECT CAST((sum(d) + count(*) - 1) // count(*) AS INTEGER) AS k
    FROM deg0
),
s1 AS (SELECT v FROM deg0, kk WHERE d >= k),
e1 AS (
    SELECT pa, pb FROM e0
    WHERE pa IN (SELECT v FROM s1) AND pb IN (SELECT v FROM s1)
),
deg1 AS (
    SELECT v, count(*) AS d
    FROM (SELECT pa AS v FROM e1 UNION ALL SELECT pb FROM e1) GROUP BY v
),
s2 AS (SELECT v FROM deg1, kk WHERE d >= k),
e2 AS (
    SELECT pa, pb FROM e1
    WHERE pa IN (SELECT v FROM s2) AND pb IN (SELECT v FROM s2)
),
deg2 AS (
    SELECT v, count(*) AS d
    FROM (SELECT pa AS v FROM e2 UNION ALL SELECT pb FROM e2) GROUP BY v
)
SELECT 0 AS round, (SELECT count(*) FROM deg0) AS nodes,
       (SELECT count(*) FROM e0) AS edges
UNION ALL
SELECT 1, (SELECT count(*) FROM deg1), (SELECT count(*) FROM e1)
UNION ALL
SELECT 2, (SELECT count(*) FROM deg2), (SELECT count(*) FROM e2)
ORDER BY round
"""


R6H_ENTRIES: dict[str, Entry] = {
    "simjoin_prefix": Entry(simjoin_prefix, SIMJOIN_PREFIX_SQL),
    "graph_triangles": Entry(graph_triangles, GRAPH_TRIANGLES_SQL),
    "basket_lift": Entry(basket_lift, BASKET_LIFT_SQL),
    "graph_core_peel": Entry(graph_core_peel, GRAPH_CORE_PEEL_SQL),
}
