"""Broadcast-hint policy tripwire (r11 verdict ask #1, made standing).

Policy (SCALE.md): ``F.broadcast`` is reserved for sides whose
cardinality is BOUNDED — by the schema (enum dims: nation, region,
brand, segment), by construction (1-row global aggregates, limit-K
heads, decile/quantile spines, CMS d×w cells, per-nation/per-source
group aggregates over enum domains), or by sublinear growth with a
documented shuffle-swap (Heaps-law vocab tables). A side that is a
constant FRACTION of an SF-scaling table (filtered part subsets,
HAVING-filtered order keys, sampled events, per-key fact aggregates)
must NOT carry the hint: at the 100 TB design point a forced broadcast
of an SF-scaling side is a driver/executor OOM, while an un-hinted
equi-join lets stats/AQE choose broadcast exactly where it fits.
Rounds 11-12 removed every such site (8 ``broadcast(customer)`` sites
in r11; part/orders/lineitem/documents/events-derived sides in r12 —
basket_lift, q17, q19, large_order_customers, decontaminate,
decontaminate_embedding, join_range_buckets).

This test pins the per-file count of ``F.broadcast(`` call sites.
Adding a hint anywhere fails it, forcing the author to re-audit the
new site against the policy above and consciously update the pin.
(Counts include docstring mentions of ``F.broadcast(`` — the tripwire
is a change detector, not a parser; comment LINES are excluded.)
"""

from __future__ import annotations

import os
import re
from collections import Counter

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data_engineering_project_capstone_spark",
)

# every file with F.broadcast sites, audited r12 (see SCALE.md and the
# r12 de-hint sweep in BENCH_NOTES.md for the per-site bound classes)
PINNED = {
    "operators/packing.py": 1,      # per-(part,chunk) offsets: |enum|×256
    "operators/similarity.py": 3,   # bounded query sides (contract-documented)
    "operators/star.py": 4,         # city/airports capstone dims
    "operators/temperatures.py": 1, # (city,month) climatology
    "plans/catalog.py": 15,         # nation/region dims, 1-row aggs, spines
    "plans/catalog_r5.py": 7,       # vocab (documented swap), 1-row, mode rows
    "plans/catalog_r6.py": 5,       # vocab tables (documented swap), totals
    "plans/catalog_r6b.py": 6,      # 1-row aggs, label centroids, 256 chunks
    "plans/catalog_r6c.py": 3,      # CMS d×w cells, per-source medians, ref
    "plans/catalog_r6d.py": 6,      # limit-K hot keys, per-lang/source totals
    "plans/catalog_r6e.py": 6,      # K seeds/centroids, 3 weights, lang rows
    "plans/catalog_r6f.py": 2,      # per-lang entropy/totals (enum domain)
    "plans/catalog_r6g.py": 2,      # 1-row reference timestamps
    "plans/catalog_r6h.py": 7,      # 25-row brand marginals, 1-row n, k_col
    "plans/catalog_r6i.py": 5,      # nation/region dims
    "plans/catalog_r6j.py": 2,      # 5 probe queries, per-label counts
    "plans/catalog_r6k.py": 7,      # decile spines, 1-row totals, 101 grid
    "plans/catalog_r6l.py": 5,      # 1-row counts/totals
    "plans/catalog_r6n.py": 2,      # cohort sizes (enum), 1-row total
    "plans/catalog_r6o.py": 3,      # 1-row counts, per-user-bounded stats
    "plans/catalog_r6p.py": 2,      # 1-row profile stats
    "plans/catalog_r6q.py": 3,      # 1-row base/mx/tot
    "plans/catalog_r6r.py": 1,      # 1-row vocab size
    "plans/catalog_r6s.py": 1,      # 1-row group stats
    "plans/catalog_r7.py": 7,       # 1-row stats, 2×2 margins, rank twins
    "plans/catalog_r7b.py": 5,      # nation dims, 1-row stats
    "plans/catalog_r7c.py": 6,      # quantile targets/located (≤|quantiles|)
    "plans/catalog_r7d.py": 1,      # 1-row stats
    "plans/catalog_r7e.py": 3,      # nation-region, 5 regions, 1-row total
    "plans/catalog_r7g.py": 3,      # 64 bit rows, bounded key panel
    "plans/catalog_r7h.py": 1,      # months×bins spine
    "plans/catalog_r7i.py": 1,      # per-point nn1 (bounded candidate agg)
    "plans/catalog_r7j.py": 6,      # per-nation (25) train/quantile aggs
    "plans/catalog_r8.py": 5,       # nation/region dims, 1-row total
    "plans/flagship.py": 10,        # capstone city/airports dims, 1-row
    "sources/layout.py": 1,         # 1-row min/max bounds
    "streaming/events.py": 1,       # stream-static dim (caller contract)
    "streaming/sketches.py": 1,     # CMS d×w cells
}


def _observed() -> dict[str, int]:
    counts: Counter = Counter()
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, PKG).replace(os.sep, "/")
            src = open(path).read()
            for m in re.finditer(r"F\.broadcast\(", src):
                line_start = src.rfind("\n", 0, m.start()) + 1
                if src[line_start : m.start()].lstrip().startswith("#"):
                    continue
                counts[rel] += 1
    return dict(counts)


def test_broadcast_sites_match_audited_pin():
    got = _observed()
    assert got == PINNED, (
        "F.broadcast call sites changed — re-audit each new/moved site "
        "against the SCALE.md bound policy (no forced broadcast of an "
        "SF-scaling side) and update the pin.\n"
        f"added/changed: { {k: v for k, v in got.items() if PINNED.get(k) != v} }\n"
        f"removed: { {k: v for k, v in PINNED.items() if k not in got} }"
    )
