"""Physical-plan regression tests: the plans must keep the shapes that
survive a 100 TB scale-up — broadcast joins for dims, pushed-down filters,
whole-stage codegen, no global single-partition windows on fact paths."""

from __future__ import annotations

import pytest

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = CATALOG[name].spark_fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def all_plans(spark) -> dict[str, str]:
    """One threaded pass building every catalog entry's physical plan,
    shared by the catalog-wide hygiene sweeps (plan construction is
    JVM-side and overlaps well; two serial sweeps cost ~40 s).
    max_workers=4 and a JVM GC between batches: several entries run
    eager localCheckpoints during construction, whose storage blocks
    are only released after the Python DataFrame is garbage-collected
    AND the ContextCleaner runs — building all ~250 plans back-to-back
    accumulated blocks faster than cleanup and died in
    BroadcastExchange with 'Not enough memory to build and broadcast'
    (round-8 post-mortem in BENCH_NOTES). The periodic System.gc()
    lets the cleaner reclaim checkpoint blocks between batches."""
    import gc
    from concurrent.futures import ThreadPoolExecutor

    names = sorted(CATALOG)
    out: dict[str, str] = {}
    with ThreadPoolExecutor(max_workers=4) as pool:
        for at in range(0, len(names), 48):
            batch = names[at : at + 48]
            out.update(pool.map(lambda n: (n, plan_of(spark, n)), batch))
            gc.collect()  # drop Python-side DataFrame refs
            spark.sparkContext._jvm.System.gc()  # let ContextCleaner run
    return out


def formatted_plan_of(spark, name: str) -> str:
    import contextlib
    import io

    df = CATALOG[name].spark_fn(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def final_plan_of(spark, name: str) -> str:
    """Execute (small SF) so AQE finalizes, then read the physical plan."""
    df = CATALOG[name].spark_fn(spark, SF)
    df.collect()  # count() would build a different plan; collect finalizes this one
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_joins_broadcast(spark):
    # r11: the explicit F.broadcast(customer) hints are gone — customer is
    # an SF-scaling table (150k×SF rows; ~1.5B at the 100 TB design point)
    # and a forced hint would OOM there. This asserts the q16 pattern
    # instead: at test scale, STATS choose the broadcast; at 100 TB, AQE
    # shuffles the same plan. Only bounded dims (nation/region) keep hints.
    for name in ["q1_avg_price_by_nation", "q2_count_by_nation_region",
                 "q3_pct_of_total", "join_multiway_revenue"]:
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, f"{name}: stats must broadcast dims"
        assert "SortMergeJoin" not in plan, f"{name}: no SMJ at test scale"


def test_filters_pushed_to_scan(spark):
    plan = formatted_plan_of(spark, "proj_filter")
    # the quantity predicate must reach the parquet reader
    assert "GreaterThan(l_quantity,30.0)" in plan.replace(" ", "")


def test_column_pruning(spark):
    plan = formatted_plan_of(spark, "proj_filter")
    # ReadSchema must request only the projected/filter columns, not all 11
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" not in rs and "l_tax" not in rs


def test_codegen_present(spark):
    # AQE only materializes codegen stages once executed; whole-stage
    # codegen renders as '*(n)' operator prefixes in Spark 4 tree strings
    plan = final_plan_of(spark, "agg_stats_summary")
    assert "*(1)" in plan, "no whole-stage-codegen spans in the final plan"
    assert "*(1) HashAggregate" in plan or "*(2) HashAggregate" in plan


def test_hash_aggregate_partial_final(spark):
    plan = plan_of(spark, "agg_stats_summary")
    # partial+final hash aggregation (map-side combine before the shuffle)
    assert plan.count("HashAggregate") >= 2


def test_no_python_udf_in_hot_paths(all_plans):
    """Every catalog plan must stay JVM-side (whole-stage codegen) —
    Python only in the explicitly-gated multimodal stubs (mapInPandas)."""
    allowed_python = {
        "multimodal_decode",
        "multimodal_features",
        "check_multimodal",  # invariant check over the mapInPandas stages
        "check_png_pixels",  # full PNG pixel decode is a mapInPandas stage
        "check_pixel_parity",  # PNG/BMP/GIF decode is a mapInPandas stage
        "check_wav_samples",  # WAV PCM decode is a mapInPandas stage
    }
    for name, plan in all_plans.items():
        if name in allowed_python:
            continue
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "PythonUDF"):
            assert marker not in plan, f"{name}: {marker} in hot path"


def test_gopher_filters_no_shuffle(spark):
    # pure per-row quality gates: the plan must contain no Exchange at all
    # (the orderBy is the only allowed one — strip the final sort first)
    df = CATALOG["text_gopher_filters"].spark_fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    body = plan.split("Sort", 1)[-1]  # everything under the output sort
    assert "Exchange hashpartitioning" not in body


def test_decontaminate_broadcasts_benchmark(spark):
    plan = plan_of(spark, "decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pack_sequences_no_per_lang_window(spark):
    """The packing running sum must window over (lang, chunk) — a window
    partitioned by lang alone is a one-task-per-language straggler at
    100 TB. The tiny pass-1 offset window over the per-chunk aggregate is
    allowed; the fact-sized window must carry the chunk column."""
    plan = plan_of(spark, "pack_sequences")
    assert "_chunk" in plan, "chunked two-pass layout missing from plan"
    # the chunk offsets must broadcast, not shuffle the fact side again
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # every Window that orders by the per-doc sort key (the fact-sized
    # running sum) must also partition by _chunk — lang alone is the
    # one-task-per-language straggler
    import re

    specs = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\], \[([^\]]*)\]", plan)
    assert specs, "no Window operators parsed from plan"
    fact_windows = [part for part, order in specs if "doc_id" in order]
    assert fact_windows, "fact-sized running-sum window not found"
    for part in fact_windows:
        assert "_chunk" in part, f"per-lang-only window spec: [{part}]"


def test_aqe_coalesces_small_shuffle(spark):
    """AQE must coalesce undersized post-shuffle partitions at runtime —
    the mechanism that makes 'set shuffle partitions high, let AQE shrink'
    safe advice at 100 TB. Final plan shows AQEShuffleRead coalesced."""
    df = CATALOG["agg_stats_summary"].spark_fn(spark, SF)
    df.collect()  # finalize adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead coalesced" in plan


def test_join_hints_respected(spark):
    """Join-strategy hints are part of the engine's tuning surface: a
    SHUFFLE_HASH hint must produce ShuffledHashJoin (avoids the sort of
    SMJ for medium tables), MERGE must produce SortMergeJoin."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    sh = orders.join(
        customer.hint("shuffle_hash"),
        orders["o_custkey"] == customer["c_custkey"],
    )
    assert "ShuffledHashJoin" in sh._jdf.queryExecution().executedPlan().toString()
    mg = orders.join(
        customer.hint("merge"), orders["o_custkey"] == customer["c_custkey"]
    )
    assert "SortMergeJoin" in mg._jdf.queryExecution().executedPlan().toString()


def test_token_budget_no_per_source_window(spark):
    """source_token_budget shares pack_sequences' two-pass layout: its
    fact-sized running-sum window must partition by (source, _chunk)."""
    import re

    plan = plan_of(spark, "source_token_budget")
    assert "_chunk" in plan and "BroadcastHashJoin" in plan
    specs = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\], \[([^\]]*)\]", plan)
    fact_windows = [part for part, order in specs if "doc_id" in order]
    assert fact_windows
    for part in fact_windows:
        assert "_chunk" in part, f"per-source-only window spec: [{part}]"


def test_no_global_window_in_fact_paths(spark):
    # per-key windows are fine; a Window with an empty partition spec on a
    # fact-sized input funnels everything through one task
    for name in ["topk_per_group", "dedup_first_wins", "events_sessionize"]:
        plan = plan_of(spark, name)
        assert "Window" in plan
        # global-window marker: 'Window [...]' with no 'partitionBy' spec is
        # hard to grep; assert the partition columns appear in the spec
        assert "SinglePartition" not in plan.split("Window")[0], name


def test_r5_bm25_broadcasts_stats(spark):
    """bm25's df/avgdl stats side must broadcast onto the corpus — a
    shuffled join for a 1-row stats table would be wrong at any scale."""
    plan = plan_of(spark, "bm25_scores")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_r5_dup_passage_single_shingle_shuffle(spark):
    """dup_passage counts via a whole-partition window over the shingle
    key: one Exchange for the (doc_id, shingle) distinct (duplicate-id
    identity, r11), one on shingle, one on doc_id — and no self-join of
    the exploded set (the 2.5×-slower shape)."""
    plan = plan_of(spark, "dup_passage_docs")
    # three hash shuffles (pair distinct, shingle window, doc_id agg); the
    # fourth Exchange is the presentation orderBy's rangepartitioning
    assert plan.count("Exchange hashpartitioning") == 3, plan
    for j in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert j not in plan


def test_r5_no_quadratic_tokenize_in_gram_plans(spark):
    """The split() must appear exactly once per scan branch in gram-building
    plans — a split nested inside the transform lambda re-evaluates per
    element (the measured 10× regression this round fixed)."""
    for name in ("dup_passage_docs", "token_bigram_pmi", "quality_curriculum",
                 "ngram_counts", "text_dup_bigrams", "dedup_jaccard_pairs"):
        plan = plan_of(spark, name)
        for line in plan.splitlines():
            # within any single operator line, split() must not occur inside
            # a lambdafunction body (the HOF re-evaluation hazard)
            for seg in line.split("lambdafunction")[1:]:
                assert "split(lower(trim(" not in seg, (
                    f"{name}: tokenizer nested in HOF lambda\n{line}"
                )


def test_r5_jaccard_block_key_not_inferred_notnull(spark):
    """The jaccard blocking join must not re-derive the shingle pipeline
    in an inferred isnotnull(block) filter below the projections: no
    Filter condition may contain the tokenizer."""
    plan = plan_of(spark, "dedup_jaccard_pairs")
    for line in plan.splitlines():
        if "Filter" in line and "isnotnull" in line:
            assert "split(lower(trim(" not in line, line


def test_r5_skew_salted_agg_two_phase(spark):
    """Salted agg = two HashAggregate pairs (partial+final per phase) and
    two Exchanges: (key, salt) then key."""
    plan = plan_of(spark, "skew_salted_agg")
    assert plan.count("Exchange") >= 2
    assert "HashAggregate" in plan


def test_r5_embedding_quantize_broadcast_scale(spark):
    """The global max|x| scale is one row — it must broadcast, and the MSE
    fold must stay a narrow map (no shuffle between scan and final agg
    beyond the label groupBy)."""
    plan = plan_of(spark, "embedding_quantize")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_r5_multires_rollup_single_pass(spark):
    """GROUPING SETS must produce ONE scan + ONE Expand + one agg shuffle
    — not three separate jobs over the fact."""
    plan = plan_of(spark, "events_multires_rollup")
    assert plan.count("Expand") == 1, plan
    assert plan.count("FileScan parquet") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_catalog_plan_hygiene_all_entries(all_plans):
    """Every catalog entry's physical plan must be free of the three
    expression-level hazards this project has hit (SCALE.md 'Expression-
    level scale hazards'):

    1. no CartesianProduct anywhere (scalar cross joins must broadcast);
    2. no tokenizer (split(lower(trim(...)))) nested inside a
       higher-order-function lambda — per-element re-evaluation. This
       also covers the nullable-join-key pushdown trap: the inferred
       isnotnull filter only becomes pathological when the re-derived
       expression contains lambdas (a scalar split recompute per row in
       a pushed filter is mild and acceptable — token_bigram_pmi's
       generate-implied size()>0 filter is the benign example).
    """
    for name, plan in all_plans.items():
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        for line in plan.splitlines():
            for seg in line.split("lambdafunction")[1:]:
                assert "split(lower(trim(" not in seg, (
                    f"{name}: tokenizer inside HOF lambda\n{line[:300]}"
                )


def test_r6_kl_and_dsir_broadcast_vocab(spark):
    """The vocab-sized sides (corpus counts / log-ratio table / scalar
    totals) must broadcast — a SortMergeJoin here would shuffle the
    exploded token stream a second time for no reason."""
    for name in ("kl_source_drift", "dsir_importance"):
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_r6_exact_substr_window_hashes_only_on_shuffle(spark):
    """The W-token window STRINGS must never ride a shuffle — only their
    md5 hashes: no Exchange input may carry a concat_ws of the token
    array (the hash is computed map-side in stage 1)."""
    plan = plan_of(spark, "exact_substr_spans")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "concat_ws" not in line, line[:300]


def test_range_join_is_hash_not_nested_loop(spark):
    """join_range_buckets exists to avoid the nested-loop a pure range
    predicate forces: the bucket equi-key must make it a broadcast hash
    join, with zero nested-loop/cartesian operators anywhere."""
    plan = plan_of(spark, "join_range_buckets")
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_weighted_sample_is_take_ordered(spark):
    """sample_weighted's top-K must compile to TakeOrderedAndProject
    (per-partition heap + K-row driver merge), never a global Sort +
    Exchange of the full corpus."""
    plan = plan_of(spark, "sample_weighted")
    assert "TakeOrderedAndProject" in plan


def test_cms_readout_broadcasts_sketch(spark):
    """sketch_cms_topk joins tokens to the D×W cell table — the cell
    side must broadcast (map-side estimate), not shuffle the tokens."""
    plan = plan_of(spark, "sketch_cms_topk")
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan


def test_salted_join_broadcasts_hot_list(spark):
    """skew_salted_join's hot-key markers (the r19 single-join form
    LEFT-joins the bounded hot list onto both sides to derive the salt
    columns) must be broadcast joins; no cartesian shapes."""
    plan = plan_of(spark, "skew_salted_join")
    assert plan.count("BroadcastHashJoin") >= 2  # fact + dim hot markers
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_tpch_classics_plan_shapes(spark):
    """r6i classics: no SortMergeJoin anywhere (dims broadcast, facts
    hash-join under AQE), date/flag filters reach the parquet scans,
    and Q10's top-K is a TakeOrdered, never a global sort."""
    for name in ["q5_local_volume", "q10_returned_items",
                 "q14_promo_revenue", "q15_top_supplier"]:
        plan = plan_of(spark, name)
        assert "SortMergeJoin" not in plan, f"{name}: unexpected SMJ"
        assert "BroadcastHashJoin" in plan, f"{name}: dims must broadcast"
    # q8's orders⋈customer edge is big-big at scale — SMJ is the right
    # static plan there (AQE converts it at small SF); but ONLY there,
    # and every dim edge must still broadcast
    q8 = plan_of(spark, "q8_market_share")
    for line in q8.splitlines():
        if "SortMergeJoin" in line:
            assert "o_custkey" in line and "c_custkey" in line, (
                f"q8: SMJ allowed only on the orders⋈customer edge: {line}"
            )
    assert q8.count("BroadcastHashJoin") >= 5, "q8: dim edges must broadcast"
    q10 = plan_of(spark, "q10_returned_items")
    assert "TakeOrderedAndProject" in q10
    f = formatted_plan_of(spark, "q10_returned_items")
    compact = f.replace(" ", "")
    assert "EqualTo(l_returnflag,R)" in compact
    assert "GreaterThanOrEqual(o_orderdate,1996-01-01" in compact


def test_lateral_topk_decorrelates_to_window_group_limit(spark):
    """r7k: the correlated LATERAL (ORDER BY + LIMIT 1) must NOT execute
    per-row — Catalyst decorrelates it into partial+final
    WindowGroupLimit (per-partition top-1 pushdown BEFORE the shuffle)
    feeding one hash join. A NestedLoop/CartesianProduct or a rank
    window without the group-limit pushdown would be the wrong plan."""
    plan = plan_of(spark, "lateral_topk")
    assert "WindowGroupLimit" in plan, "lateral must decorrelate to top-k"
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_trimmed_mean_window_partitioned_by_group(spark):
    """r7k: the trim ranking must partition by nation — a global
    (unpartitioned) Sort of the fact would be the 100 TB killer."""
    plan = plan_of(spark, "trimmed_mean_price")
    import re

    for m in re.finditer(r"Window .*windowspecdefinition\(([^)]*)", plan):
        assert "c_nationkey" in m.group(1) or "g#" in m.group(1), (
            f"unpartitioned window in trimmed_mean plan: {m.group(0)[:120]}"
        )


def test_graph_triangles_aqe_recovers_broadcast_when_adj_small(spark):
    """Pins the scale claim in graph_triangles's docstring
    (catalog_r6h.py): the shuffle-join form is the right DEFAULT because
    adj is O(E) bytes, and AQE's runtime shuffle->broadcast conversion
    recovers the measured-3.7s broadcast plan whenever the adjacency
    side lands under the 10 MB threshold. At sf0.01 the adjacency is
    ~1.5 MB, so the ADAPTIVE FINAL plan (post-execution) must place the
    per-edge intersection joins as BroadcastHashJoin with no surviving
    SortMergeJoin — without any F.broadcast hint in the source.

    Since r18 the entry cuts lineage at per_edge (the witness arrays
    are materialized once instead of re-derived per union branch), so
    the entry's terminal plan no longer contains the joins; this pin
    drives the same pre-cut join+intersect subplan the entry builds,
    via the shared _triangle_oriented_adj skeleton and the entry's
    attach order (outs_d first)."""
    from pyspark.sql import functions as F

    from data_engineering_project_capstone_spark.plans.catalog_r6h import (
        _triangle_oriented_adj,
    )

    _e, _deg, dir_e, adj = _triangle_oriented_adj(
        spark, "/root/testdata/sf0.01"
    )
    sa = adj.select(F.col("v").alias("src"), F.col("outs").alias("outs_s"))
    sb = adj.select(F.col("v").alias("dst"), F.col("outs").alias("outs_d"))
    df = (
        dir_e.join(sb, "dst")
        .join(sa, "src")
        .select(
            "src", "dst", F.array_intersect("outs_s", "outs_d").alias("wit")
        )
    )
    df.collect()  # AQE finalizes only on execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    final = plan.split("== Initial Plan ==")[0]
    # the orientation + adjacency joins all convert at this scale
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final
    # and specifically the out-list intersection join (the 100 TB-heavy
    # one) is among the converted joins
    import re

    # (r18: the intersect is computed once in a Project ABOVE the join —
    # no longer collapsed into the join condition — so the pin checks
    # that BOTH attach joins converted and the intersect survives in
    # the final plan's projection)
    assert len(re.findall(r"BroadcastHashJoin", final)) >= 2, final
    assert "array_intersect" in final


def test_r8_q1_scan_bound_shape(spark):
    """Q1 must keep the classic scan-bound shape: the shipdate filter
    pushed to the parquet reader and a partial+final HashAggregate pair
    (map-side combine carries the 100 TB case)."""
    plan = formatted_plan_of(spark, "q1_pricing_summary")
    assert "PushedFilters" in plan and "l_shipdate" in plan.split(
        "PushedFilters:"
    )[1].splitlines()[0], "shipdate filter must reach the scan"
    assert plan.count("HashAggregate") >= 2, "need partial+final agg"


def test_r8_q2_dims_broadcast_fact_once(spark):
    """Q2's supplier/nation/region/part dims must broadcast, the
    lineitem fact must be scanned exactly once, and the correlated min
    must decorrelate into a part-partitioned window (never a self-join
    — a per-part min table is too big to broadcast at scale and an SMJ
    back against the fact-sized pair set would double the shuffles)."""
    plan = plan_of(spark, "q2_min_cost_supplier")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("lineitem.parquet") == 1, (
        "fact must be scanned exactly once"
    )
    import re

    w = [ln for ln in plan.splitlines() if re.search(r"\bWindow\b", ln)]
    assert w and all("pk" in ln for ln in w), (
        "per-part min must be a window PARTITIONED BY pk, never global"
    )


def test_r8_q16_exclusion_is_broadcast_anti(spark):
    plan = plan_of(spark, "q16_supplier_part_counts")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, (
        "complained-supplier exclusion must be a broadcast anti-join"
    )
    assert "SortMergeJoin" not in plan
