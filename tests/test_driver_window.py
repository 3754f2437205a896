"""Standing staleness assertion on the driver window (r12 verdict ask
#7a: the per-round manual staleness audit, retired into a tripwire).

The driver evaluates ``queries()[:50]`` each round against the DuckDB
oracle. The rotation rule the verdicts converged on: lead with entries
whose CODE changed since their last driver row (manual, git-dependent —
not machine-checked here), then fill with the STALEST oracle-paired
entries (oldest latest-green CORRECTNESS row). This test pins the
machine-checkable half: no oracle-paired entry outside the current
window may be strictly staler than the freshness floor of the entries
left out — i.e. the window must contain ALL entries from the oldest
remaining rounds (up to the changed-first leads, which are allowed to
displace the newest tail of the staleness fill).

Rows-only entries (no oracle SQL) are excluded by design: they carry a
once-only no_oracle record plus a green hashable check_* twin.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Entries allowed to lead the window ahead of strict staleness order:
# changed since their last driver row (kept in sync with the window
# comment in plans/catalog.py each round, and machine-checked below to
# be a subset of the actual window — a lead dropped from the window
# fails loudly instead of silently losing its fresh-row slot).
# r18: EMPTY — no catalog entry's code path changed this round (the
# r18 source delta is the bench loadavg-gate hardening + test pins,
# neither of which touches any entry's execution). The window is the
# 9-entry r12-row alphabetical tail queued by r17 plus the full
# 41-entry r13-row cohort.
CHANGED_FIRST_LEADS: set[str] = set()

# Rows-only (no_oracle) entries explicitly slotted into the CURRENT
# window for a rows-recorded driver row. This was a ONE-ROUND allowance
# (r16 verdict ask #2, executed in the r17 window): the 8 no_oracle
# entries' only prior rows predated the r3/r4 testdata regeneration,
# and each got a fresh rows-recorded row in CORRECTNESS_r17. EMPTY
# since r18 — every window slot must be oracle-paired again. When a
# future round slots rows-only entries deliberately, repopulate this
# set for that round only (the containment check below is conditional
# on the set being non-empty, so emptying it never fails; advisor r17).
ROWS_ONLY_REFRESH: set[str] = set()


def _latest_green() -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for name, row in json.load(open(f)).items():
            # an explicit hash_match=False is a RED row even when the
            # row counts matched (advisor r13): a failed hash-parity
            # row must not refresh an entry's staleness and keep it
            # out of the window this tripwire forces it into.
            ok = row.get("hash_match") or (
                row.get("hash_match") is None
                and row.get("rows_match")
                and row.get("err") is None
            )
            if ok:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def test_window_contains_all_stalest_oracle_entries():
    import __spark_entry__ as entry

    names = list(entry.queries().keys())
    oracle = set(entry.oracle_sql().keys())
    window = [n for n in names[:50]]
    assert len(window) == 50
    non_oracle = {n for n in window if n not in oracle}
    assert non_oracle <= ROWS_ONLY_REFRESH, (
        "window slots must be oracle-paired except the explicitly "
        f"slotted rows-only refresh entries; unexpected: "
        f"{sorted(non_oracle - ROWS_ONLY_REFRESH)}"
    )
    # conditional (advisor r17): the exemption above always holds, but
    # requiring containment only makes sense in a round that actually
    # slots rows-only entries — an emptied set must not demand anything.
    if ROWS_ONLY_REFRESH:
        assert ROWS_ONLY_REFRESH <= set(window), (
            f"rows-only refresh entries missing from the driver window: "
            f"{sorted(ROWS_ONLY_REFRESH - set(window))}"
        )
    assert CHANGED_FIRST_LEADS <= set(window), (
        f"changed-first leads missing from the driver window: "
        f"{sorted(CHANGED_FIRST_LEADS - set(window))}"
    )

    latest = _latest_green()
    outside = [n for n in names[50:] if n in oracle]
    # every outside entry must have SOME green row (full-catalog
    # coverage across rounds — an entry with no row ever is a gap)
    missing = [n for n in outside if n not in latest]
    assert not missing, f"oracle entries with no green driver row: {missing}"

    floor_outside = min(latest[n] for n in outside)
    # any entry strictly staler than everything left outside MUST be in
    # the window (modulo the changed-first leads, which never hurt:
    # they occupy slots but the assertion is about omissions)
    too_stale_omitted = [
        n for n in outside if latest[n] < floor_outside
    ]  # vacuous by construction — kept for clarity
    assert not too_stale_omitted
    stale_window_required = [
        n
        for n, r in latest.items()
        if r < floor_outside and n in oracle and n in names
    ]
    not_in_window = [n for n in stale_window_required if n not in window]
    assert not not_in_window, (
        f"entries staler (r<{floor_outside}) than every omitted entry "
        f"are missing from the driver window: {not_in_window}"
    )
