"""Broadcast-hint policy tripwire (r11 verdict ask #1, made standing;
r13: upgraded from per-file COUNTS to per-file call-site SNIPPETS).

Policy (SCALE.md): ``F.broadcast`` is reserved for sides whose
cardinality is BOUNDED — by the schema (enum dims: nation, region,
brand, segment), by construction (1-row global aggregates, limit-K
heads, decile/quantile spines, CMS d×w cells, per-nation/per-source
group aggregates over enum domains), or by sublinear growth with a
documented shuffle-swap (Heaps-law vocab tables). A side that is a
constant FRACTION of an SF-scaling table (filtered part subsets,
HAVING-filtered order keys, sampled events, per-key fact aggregates,
near-dup component maps) must NOT carry the hint: at the 100 TB design
point a forced broadcast of an SF-scaling side is a driver/executor
OOM, while an un-hinted equi-join lets stats/AQE choose broadcast
exactly where it fits. Rounds 11-13 removed every such site
(8 ``broadcast(customer)`` sites in r11; part/orders/lineitem/
documents/events-derived sides in r12; r13 closed the last two that
had survived under mislabeled count pins: bloom_prefilter_join's
BUILDING-segment customer key panel and _split_assignments' near-dup
component map).

This test pins the per-file NORMALIZED LINE SNIPPET of every
``F.broadcast(`` call site (advisor r12: a bare count lets a new
SF-scaling-side hint silently replace an audited bounded-side hint in
the same file). Adding, moving, or REWORDING a hint fails it, forcing
the author to re-audit the changed site against the policy above and
consciously update the pin. (Snippets include docstring mentions of
``F.broadcast(`` — the tripwire is a change detector, not a parser;
comment LINES are excluded. A snippet is the call-site line from
``F.broadcast(`` to end-of-line, whitespace-normalized; per-file lists
are sorted, duplicates meaningful.)
"""

from __future__ import annotations

import os
import re

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data_engineering_project_capstone_spark",
)

# every F.broadcast call site, audited r12 + r13 de-hint sweep (see
# SCALE.md and BENCH_NOTES.md for the per-site bound classes noted in
# the per-file comments below)
PINNED: dict[str, list[str]] = {
    # per-(part,chunk) offsets: |enum|×256
    "operators/packing.py": ['F.broadcast(off),'],
    # bounded query sides (contract-documented)
    "operators/similarity.py": [
        'F.broadcast(q))',
        'F.broadcast(q), "bucket")',
        'F.broadcast(q), "cell")',
    ],
    # city/airports capstone dims (bounded: world-city domain)
    "operators/star.py": [
        'F.broadcast(airports),',
        'F.broadcast(city),',
        'F.broadcast(city),',
        'F.broadcast(city), temps_staging["city"] == city["c_name"], "inner"',
    ],
    # (city,month) climatology — bounded by city×12
    "operators/temperatures.py": [
        'F.broadcast(climatology), ["city", "month"], "left")',
    ],
    # nation/region dims, 1-row aggs, enum spines (r13: split_assign's
    # comps hint REMOVED — documents-derived O(corpus))
    "plans/catalog.py": [
        'F.broadcast(counts), F.col("seg").eqNullSafe(F.col("_cseg"))',
        'F.broadcast(days)',
        'F.broadcast(n_docs))',
        'F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))',
        'F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))',
        'F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))',
        'F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))',
        'F.broadcast(nation_avg), "c_nationkey")',
        'F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))',
        'F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))',
        'F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))',
        'F.broadcast(stats), "lang")',
        'F.broadcast(thresh))',
        'F.broadcast(total))',
    ],
    # vocab (documented shuffle swap), 1-row stats, mode rows
    "plans/catalog_r5.py": [
        'F.broadcast(gmax)).withColumn(',
        'F.broadcast(mode_df), "o_orderpriority")',
        'F.broadcast(n_total))',
        'F.broadcast(stats))',
        'F.broadcast(total))',
        'F.broadcast(u1), "w1")',
        'F.broadcast(u2), "w2")',
    ],
    # vocab tables (documented swap), 1-row totals, enum source totals
    "plans/catalog_r6.py": [
        'F.broadcast(corp_cnt), "tok")',
        'F.broadcast(n_total))',
        'F.broadcast(ratio), "tok")',
        'F.broadcast(src_tot), "source")',
        'F.broadcast(tot))',
    ],
    # 1-row aggs, label centroids (enum labels), 256 chunk offsets
    "plans/catalog_r6b.py": [
        'F.broadcast(base))',
        'F.broadcast(cent), "label").select(',
        'F.broadcast(logp), "tok")',
        'F.broadcast(mx)).withColumn(',
        'F.broadcast(offs), "_chunk")',
        'F.broadcast(tot)).select(',
    ],
    # CMS d×w cells, per-source medians (enum), 1-row ref
    "plans/catalog_r6c.py": [
        'F.broadcast(cms), ["d", "bucket"])',
        'F.broadcast(med), "source")',
        'F.broadcast(ref))',
    ],
    # limit-K hot keys, per-lang/per-source totals (enum domains)
    "plans/catalog_r6d.py": [
        'F.broadcast(col_tot), "lang")',
        # hot is top-K by count (K=100, bounded regardless of SF);
        # r19 single-join salting marks both sides via LEFT joins
        # against the same bounded list
        'F.broadcast(hot),',
        'F.broadcast(hot), li["l_orderkey"] == hot["_hot_key"], "left"',
        'F.broadcast(n))',
        'F.broadcast(row_tot), "source")',
    ],
    # K seeds/centroids, 3 mixture weights, per-lang rows (enum)
    "plans/catalog_r6e.py": [
        'F.broadcast(',
        'F.broadcast(cent), "pos")',
        'F.broadcast(seeds), "vec_id")',
        'F.broadcast(sources.withColumnRenamed("source", "cand")))',
        'F.broadcast(top_lang), F.lit(True), "left").select(',
        'F.broadcast(w), "j")',
    ],
    # per-lang entropy/totals (enum domain)
    "plans/catalog_r6f.py": [
        'F.broadcast(h_lang))',
        'F.broadcast(lang_tot), "lang")',
    ],
    # 1-row reference timestamps
    "plans/catalog_r6g.py": [
        'F.broadcast(ref))',
        'F.broadcast(ref))',
    ],
    # 25-row brand marginals, 1-row n, k_col; adj/deg mentions are
    # DOCSTRING text describing the REJECTED variant (not call sites)
    "plans/catalog_r6h.py": [
        'F.broadcast(adj).',
        'F.broadcast(deg)+F.broadcast(adj).',
        'F.broadcast(degrees(e).agg(F.count("*").cast("long").alias("nodes")))',
        'F.broadcast(k_col))',
        'F.broadcast(ma), "brand_a")',
        'F.broadcast(mb), "brand_b")',
        'F.broadcast(n))',
    ],
    # nation/region dims, 1-row mx
    "plans/catalog_r6i.py": [
        'F.broadcast(',
        'F.broadcast(mx))',
        'F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))',
        'F.broadcast(nr), F.col("c_nationkey") == F.col("cust_nk")',
        'F.broadcast(nr), F.col("c_nationkey") == F.col("n_nationkey")',
    ],
    # 5 probe queries, per-label counts (enum)
    "plans/catalog_r6j.py": [
        'F.broadcast(n_lab), F.col("q_label") == F.col("label"), "left"',
        'F.broadcast(q_lab), "query_id")',
    ],
    # decile spines, 1-row totals, 101-point grid
    "plans/catalog_r6k.py": [
        'F.broadcast(grid))',
        'F.broadcast(n_ord))',
        'F.broadcast(n_tot))',
        'F.broadcast(ref))',
        'F.broadcast(s_rev))',
        'F.broadcast(targets)',
        'F.broadcast(true_rev))',
    ],
    # 1-row counts/totals, 1-row orphans agg, 2×2 cross
    "plans/catalog_r6l.py": [
        'F.broadcast(a.crossJoin(b)))',
        'F.broadcast(orphans.agg(F.count("*").alias("orphans")))',
        'F.broadcast(ref))',
        'F.broadcast(tot))',
        'F.broadcast(tot))',
    ],
    # cohort sizes (enum), 1-row total
    "plans/catalog_r6n.py": [
        'F.broadcast(cohort_size), "cohort_idx")',
        'F.broadcast(tot))',
    ],
    # 1-row counts, per-user-bounded stats
    "plans/catalog_r6o.py": [
        'F.broadcast(n_c))',
        'F.broadcast(n_p))',
        'F.broadcast(stats))',
    ],
    # 1-row profile stats
    "plans/catalog_r6p.py": [
        'F.broadcast(out_cnt))',
        'F.broadcast(stats))',
    ],
    # 1-row base/mx/tot
    "plans/catalog_r6q.py": [
        'F.broadcast(base))',
        'F.broadcast(mx))',
        'F.broadcast(tot))',
    ],
    # 1-row vocab size
    "plans/catalog_r6r.py": ['F.broadcast(vocab))'],
    # 1-row group stats
    "plans/catalog_r6s.py": ['F.broadcast(b))'],
    # 1-row stats, 2×2 margins, doubled-rank twins (bounded rank grid)
    "plans/catalog_r7.py": [
        'F.broadcast(diag)).crossJoin(F.broadcast(marg))',
        'F.broadcast(doubled_ranks(per_cust, "x")), "x"',
        'F.broadcast(doubled_ranks(per_cust, "y")), "y")',
        'F.broadcast(marg))',
        'F.broadcast(stats))',
        'F.broadcast(stats))',
        'F.broadcast(tot))',
    ],
    # nation dims, 1-row stats
    "plans/catalog_r7b.py": [
        'F.broadcast(',
        'F.broadcast(nations),',
        'F.broadcast(nations),',
        'F.broadcast(nations),',
        'F.broadcast(stats))',
    ],
    # quantile targets/located (≤|quantiles| rows), 1-row mm/tot
    "plans/catalog_r7c.py": [
        'F.broadcast(located),',
        'F.broadcast(located),',
        'F.broadcast(mm))',
        'F.broadcast(n_total))',
        'F.broadcast(targets))',
        'F.broadcast(tot))',
    ],
    # 1-row stats
    "plans/catalog_r7d.py": ['F.broadcast(stats))'],
    # nation-region (25 rows), 5 regions, 1-row total
    "plans/catalog_r7e.py": [
        'F.broadcast(nr), F.col("c_nationkey") == F.col("n_nationkey")',
        'F.broadcast(per_region), F.col("r_name") == F.col("r2")',
        'F.broadcast(total))',
    ],
    # ONLY the two m=4096-bounded bit tables (r13: the BUILDING-segment
    # customer key panel hint REMOVED — ~1/5 constant fraction of
    # customer, SF-scaling)
    "plans/catalog_r7g.py": [
        'F.broadcast(bits.select(F.col("b").alias("h1"))), "h1", "left_semi"',
        'F.broadcast(bits.select(F.col("b").alias("h2"))), "h2", "left_semi"',
    ],
    # months × bins spine (both enum-bounded)
    "plans/catalog_r7h.py": [
        'F.broadcast(bins)) # months × bins, both tiny',
    ],
    # 1-row dbscan readout stats (global scalar aggregate of cluster
    # sizes — never SF-scaling; re-audited r19 after the r18 readout
    # fusion moved the broadcast from nn1 to stats)
    "plans/catalog_r7i.py": ['F.broadcast(stats))'],
    # per-nation (25) train/quantile aggs
    "plans/catalog_r7j.py": [
        'F.broadcast(per_g), per_gf.g == per_g.g2)',
        'F.broadcast(q), "g")',
        'F.broadcast(q.select("g", "q", "n_calib")), "g")',
        'F.broadcast(train), "g")',
        'F.broadcast(train), "g")',
        'F.broadcast(train), "g")',
    ],
    # nation/region dims, 1-row total
    "plans/catalog_r8.py": [
        'F.broadcast(',
        'F.broadcast(',
        'F.broadcast(',
        'F.broadcast(t(spark, sf_dir, "nation")),',
        'F.broadcast(total))',
    ],
    # capstone city/airports dims, 1-row total
    "plans/flagship.py": [
        'F.broadcast(airports), travelers["p_airport_id"] == airports["a_id"]',
        'F.broadcast(airports), travelers["p_airport_id"] == airports["a_id"]',
        'F.broadcast(airports), travelers["p_airport_id"] == airports["a_id"]',
        'F.broadcast(city), F.col("a_city_id") == F.col("c_id"))',
        'F.broadcast(city), F.col("a_city_id") == F.col("c_id"))',
        'F.broadcast(city), avg_age["a_city_id"] == city["c_id"])',
        'F.broadcast(stats), F.col("s_city_id") == F.col("c_id"))',
        'F.broadcast(stats), F.col("s_city_id") == F.col("c_id"))',
        'F.broadcast(t), F.col("t_city_id") == F.col("c_id"))',
        'F.broadcast(total))',
    ],
    # 1-row min/max bounds
    "sources/layout.py": ['F.broadcast(bounds)).select('],
    # stream-static dim (caller contract: bounded user panel)
    "streaming/events.py": [
        'F.broadcast(user_stats), "user_id", "left")',
    ],
    # CMS d×w cells
    "streaming/sketches.py": [
        'F.broadcast(sketch), ["d", "bucket"], "left")',
    ],
}


def _observed() -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, PKG).replace(os.sep, "/")
            src = open(path).read()
            snips = []
            for m in re.finditer(r"F\.broadcast\(", src):
                line_start = src.rfind("\n", 0, m.start()) + 1
                if src[line_start : m.start()].lstrip().startswith("#"):
                    continue
                line_end = src.find("\n", m.start())
                if line_end == -1:
                    line_end = len(src)
                snips.append(
                    re.sub(r"\s+", " ", src[m.start() : line_end].strip())
                )
            if snips:
                out[rel] = sorted(snips)
    return out


def test_broadcast_sites_match_audited_pin():
    got = _observed()
    diffs = {}
    for k in sorted(set(got) | set(PINNED)):
        if got.get(k) != PINNED.get(k):
            diffs[k] = {"observed": got.get(k), "pinned": PINNED.get(k)}
    assert not diffs, (
        "F.broadcast call sites changed — re-audit each new/moved/"
        "reworded site against the SCALE.md bound policy (no forced "
        "broadcast of an SF-scaling side) and update the pin.\n"
        f"diffs: {diffs}"
    )
