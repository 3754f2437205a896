"""Structural tripwires on the official bench artifact's contract.

BENCH_r{N}.json is the standing cross-round performance evidence
(BENCH_NOTES drift protocol); the judge compares it round-over-round.
Two silent ways to corrupt it with an innocent-looking edit:

1. a duplicate name in HEADLINE — the per-query dict collapses the
   duplicate, the total drops by that query's time, and the artifact
   reads as a phantom speedup;
2. dropping one of the aux fields the ledger's attribution protocol
   relies on (pass totals, loadavg gate/readings, the reliable-path
   tag, the memo first-rep twins, the prior-headline subtotal).

Neither is exercised by running bench at test time (a full sf0.1 run
is minutes); these pins are static. The module-level asserts in
bench.py (prior-headline subset, minhash-consumer ordering) also fire
on the import below, so a violation of those fails here too.
"""

from __future__ import annotations

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_headline_names_unique_and_in_catalog():
    import bench

    assert len(bench.HEADLINE) == len(set(bench.HEADLINE)), (
        "duplicate HEADLINE entry — the per-query dict would collapse "
        "it and the total would silently drop"
    )
    missing = [n for n in bench.HEADLINE if n not in bench.CATALOG]
    assert not missing, f"HEADLINE names not in CATALOG: {missing}"


def _aux_literal_keys() -> set[str]:
    """String keys of the dict literal bound to the "aux" key inside
    bench.py's OUTPUT dict, found structurally via AST (advisor r16: a
    raw substring search would be satisfied by a quoted key surviving
    in a docstring or dead code even after the actual aux emit was
    removed). Anchored to the output dict itself (advisor r17): the
    enclosing dict literal must also carry the "metric" and "queries"
    keys, so a decoy {'aux': {...}} literal in helper/dead code can't
    satisfy the pin if the real emit were removed."""
    import ast

    src = open(os.path.join(REPO, "bench.py")).read()
    for node in ast.walk(ast.parse(src)):
        if not isinstance(node, ast.Dict):
            continue
        sibling_keys = {
            k.value
            for k in node.keys
            if isinstance(k, ast.Constant) and isinstance(k.value, str)
        }
        if not {"metric", "queries", "aux"} <= sibling_keys:
            continue
        for k, v in zip(node.keys, node.values):
            if (
                isinstance(k, ast.Constant)
                and k.value == "aux"
                and isinstance(v, ast.Dict)
            ):
                return {
                    kk.value
                    for kk in v.keys
                    if isinstance(kk, ast.Constant)
                    and isinstance(kk.value, str)
                }
    raise AssertionError(
        'bench.py no longer builds an "aux" dict literal inside its '
        'output dict (the dict carrying "metric" and "queries")'
    )


def test_loadavg_gate_is_bounded_retry_until_quiet():
    # r17 verdict ask #2: the single-sleep gate admitted two
    # load-inflated official lines in three rounds (r15, r17 — the
    # latter passed at 1.98 vs the old 2.0 threshold on a climbing
    # host). The hardened gate is a bounded retry loop: up to 5 x 60s
    # sleeps until the 1-min loadavg drops below 1.5. Pin the two
    # constants structurally so a future edit can't silently loosen
    # the gate back to one sleep or raise the threshold.
    import ast

    src = open(os.path.join(REPO, "bench.py")).read()
    consts = {
        t.id: node.value.value
        for node in ast.walk(ast.parse(src))
        if isinstance(node, ast.Assign) and isinstance(node.value, ast.Constant)
        for t in node.targets
        if isinstance(t, ast.Name)
        and t.id in ("GATE_THRESHOLD", "GATE_MAX_SLEEPS", "PROBE_GATE_THRESHOLD")
    }
    assert consts.get("GATE_THRESHOLD") == 1.5, consts
    assert consts.get("GATE_MAX_SLEEPS") == 5, consts
    # r18: the gate also retries on the CPU calibration probe reading
    # out-of-band — the loadavg-invisible hypervisor-dilation class
    # measured this round (a 42.8s capture started at loadavg 0.06 but
    # probe 0.304; the probe saw it, loadavg could not).
    assert consts.get("PROBE_GATE_THRESHOLD") == 0.25, consts


def test_aux_ledger_fields_still_emitted():
    # structural source pin: the aux keys the round-over-round
    # attribution protocol reads (BENCH_NOTES r16) must appear as dict
    # keys inside the aux literal itself. Renaming or dropping one must
    # be a conscious BENCH_NOTES-documented change, not a refactor
    # casualty.
    keys = _aux_literal_keys()
    for key in (
        "dedup_minhash_lsh_unmemoized_warm_sec",
        "dedup_resolve_clusters_first_rep_sec",
        "er_golden_records_first_rep_sec",
        "prior_headline_subtotal_sec",
        "loadavg_start",
        "loadavg_end",
        "loadavg_gate_readings",
        "probe_gate_readings",
        "pass_totals_sec",
        "pass_loadavg_1min",
        "cpu_probe_sec",
        "reliable_checkpoint_path",
    ):
        assert key in keys, f"bench.py no longer emits aux.{key}"
