"""Lineage-cut policy tripwire (r14 verdict ask, made standing r15 —
the exact shape of tests/test_broadcast_policy.py, for checkpoints).

Policy (pkg/operators/lineage.py:30-38, swept once in r14): every
LOOP-CONSUMED cut (iterative operators' in-loop cadence cuts and their
loop-invariant inputs) and every SESSION-MEMOIZED cut (reused across
driver queries) must route through ``lineage.materialize`` — reliable
checkpoint when the session has a checkpoint dir (the 100 TB recovery
story), localCheckpoint fallback otherwise. One-shot multi-consumer
cuts INSIDE a single entry evaluation deliberately stay raw
``localCheckpoint``: a loss mid-entry fail-stops just that query, whose
retry re-runs it from source — a reliable write there would pay a
storage round-trip per query run for no recovery a plain retry doesn't
already provide.

Nothing in r14's one-time sweep stops a future loop-consumed or
session-memoized cut landing as a raw ``localCheckpoint`` unnoticed.
This test pins the per-file NORMALIZED LINE SNIPPET of every
``.localCheckpoint(`` / ``.checkpoint(`` call site in the package, each
audited against the policy (the per-file comments note the class).
Adding, moving, or rewording a cut fails it, forcing the author to
classify the new site — one-shot intra-entry (raw is fine), or
loop-consumed / session-memoized (must be ``materialize``) — and
consciously update the pin. (Snippets are the full source line,
whitespace-normalized; per-file lists sorted, duplicates meaningful.
Call sites are found by walking each module's AST for ``Call`` nodes
whose callee attribute is ``checkpoint``/``localCheckpoint`` — advisor
r15: the earlier textual scan would have pinned a phantom site for a
docstring or string literal mentioning ``df.checkpoint(...)``.)
"""

from __future__ import annotations

import ast
import os
import re

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data_engineering_project_capstone_spark",
)

# every raw checkpoint call site, audited r14 sweep + r15 pin. All raw
# localCheckpoint sites below are ONE-SHOT INTRA-ENTRY cuts: computed
# and consumed 2-3x within a single entry evaluation, never looped over,
# never memoized across queries.
PINNED: dict[str, list[str]] = {
    # the sanctioned implementation itself: materialize()'s reliable
    # path (eager forced — lazy reliable pays the doCheckpoint
    # recompute) and its local fallback
    "operators/lineage.py": [
        "return df.checkpoint(eager=True)",
        "return df.localCheckpoint(eager=eager)",
    ],
    # one-shot (r19): dsir_importance's vocab counts — tot and ratio
    # prune the subtree differently, so without the cut each re-derives
    # the corpus explode+count (the pmi/kl twins of this cut were
    # measured SLOWER under the bench's count() action — which prunes
    # the uncut forms' duplicate subtrees below the cut's cost — and
    # reverted; dsir's cut wins under both actions)
    "plans/catalog_r6.py": [
        ").localCheckpoint() # one-shot: tot + ratio consumers of the vocab table",
    ],
    # one-shot: |langs|²-row confusion table (3 consumers), daily agg
    # feeding stats + both join sides
    "plans/catalog_r7.py": [
        "conf = conf.localCheckpoint() # 3 consumers of a |langs|²-row table",
        "daily = daily.localCheckpoint() # feeds stats + both join sides",
    ],
    # one-shot: per-part agg + probe side (r18: q21's per_os cut removed
    # — the rollup became window aggregates over the same rows, so
    # per_os has a single consumer and needs no cut)
    "plans/catalog_r7b.py": [
        "li = li.localCheckpoint() # feeds the per-part agg AND the probe side",
    ],
    # one-shot: value panels feeding histogram + the phase-2 probe
    # (two entries, same shape)
    "plans/catalog_r7c.py": [
        "vals = vals.localCheckpoint() # feeds histogram + phase-2 probe",
        "vals = vals.localCheckpoint() # feeds histogram + phase-2 probe",
    ],
    # one-shot: hourly agg feeding stats + the flagged window
    "plans/catalog_r7d.py": [
        "hours = hours.localCheckpoint() # feeds stats + the flagged window",
    ],
    # one-shot: daily/per-nation aggs with 3 join consumers each
    "plans/catalog_r7e.py": [
        "daily = daily.localCheckpoint() # 3 join consumers",
        "per_nation = per_nation.localCheckpoint() # 3 consumers",
    ],
    # one-shot: daily bloom panel (band join + current side), key table
    # (bit probes + true-match verify)
    "plans/catalog_r7g.py": [
        "daily = daily.localCheckpoint() # band join + current side",
        "keys = keys.localCheckpoint() # bits + true-match consumers",
    ],
    # one-shot: spatial point panel (probe + home sides)
    "plans/catalog_r7h.py": [
        "pts = pts.localCheckpoint() # probe + home sides",
    ],
    # one-shot: OOF row split consumed by three fold assemblies
    "plans/catalog_r7j.py": [
        "rows = rows.localCheckpoint() # three split consumers",
    ],
    # one-shot: triangle edge list + directed edge list, both consumed
    # 2-3x inside graph_triangles' single evaluation (the ITERATIVE
    # graph cuts in this file route through materialize at :513/:530)
    "plans/catalog_r6h.py": [
        # r18: the dir_e cut moved to the grouped adjacency (same
        # information, ~12x fewer bytes per consumer read; the edge
        # stream is regenerated by exploding it)
        # the grouped adjacency (r18; the edge stream is re-exploded
        # from it) and the degree table (r18; 3 consumers whose map
        # side otherwise re-reads e twice per evaluation)
        ").localCheckpoint()",
        ").localCheckpoint()",
        "e = e.localCheckpoint()",
    ],
    # one-shot: per-part agg (total + probe), per-(part,supp) rollup
    # (rollup + probe)
    "plans/catalog_r8.py": [
        "per_part = per_part.localCheckpoint() # feeds the total AND the probe",
        "per_ps = per_ps.localCheckpoint() # feeds the rollup AND the probe",
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
            lines = src.splitlines()
            snips = []
            # AST walk, not a text grep (advisor r15): only genuine
            # Call nodes count, so docstrings, comments, and string
            # literals mentioning `.checkpoint(` can neither pin a
            # phantom site nor spuriously fail the pin. The snippet is
            # the source line containing the attribute name (the same
            # line the old textual scan captured), so PINNED entries
            # are unchanged.
            for node in ast.walk(ast.parse(src, filename=path)):
                if (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr in ("checkpoint", "localCheckpoint")
                ):
                    line = lines[node.func.end_lineno - 1]
                    snips.append(re.sub(r"\s+", " ", line.strip()))
            if snips:
                out[rel] = sorted(snips)
    return out


def test_scanner_skips_strings_and_comments_but_sees_calls():
    """Self-check of the AST scanner's semantics (advisor r15): string
    literals, docstrings, and comments mentioning checkpoint calls are
    invisible; real calls — including multi-line and eager=False forms —
    are captured by the line holding the attribute name."""
    src = (
        '"""Module doc: never call df.checkpoint(eager=False) lazily."""\n'
        "MSG = 'see df.localCheckpoint() docs'\n"
        "# x = df.checkpoint()\n"
        "a = df.localCheckpoint()  # real\n"
        "b = (df\n"
        "     .checkpoint(eager=False))\n"
    )
    snips = []
    for node in ast.walk(ast.parse(src)):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr in ("checkpoint", "localCheckpoint")
        ):
            line = src.splitlines()[node.func.end_lineno - 1]
            snips.append(re.sub(r"\s+", " ", line.strip()))
    assert sorted(snips) == [
        ".checkpoint(eager=False))",
        "a = df.localCheckpoint() # real",
    ], snips


def test_checkpoint_sites_match_audited_pin():
    got = _observed()
    diffs = {}
    for k in sorted(set(got) | set(PINNED)):
        if got.get(k) != PINNED.get(k):
            diffs[k] = {"observed": got.get(k), "pinned": PINNED.get(k)}
    assert not diffs, (
        "raw checkpoint call sites changed — classify each new/moved/"
        "reworded cut against the lineage.py policy (loop-consumed or "
        "session-memoized cuts MUST route through lineage.materialize; "
        "one-shot intra-entry cuts stay raw localCheckpoint) and update "
        "the pin.\n"
        f"diffs: {diffs}"
    )
