"""Seeded random-corpus fuzz for the events family — same recipe as
test_fuzz_differential (whole random tables from small tie-heavy value
domains, fixed seeds) pointed at the event-stream consumers, whose
hazard surface is ORDERING: same-instant events per user (sessionize /
funnel / transition tie-breaks), NULL timestamps in windows, NULL and
off-enum types through pivots and path builders, malformed JSON props.

The hand-built degenerate-events corpus places one duplicate-ts pair;
a random corpus with a 6-instant time domain over 60 events per user
places dozens of multi-way ties per seed. Entry list is IMPORTED from
the degenerate net so the two sweeps can never drift apart."""

from __future__ import annotations

import datetime as dt
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from degen_util import assert_entry_matches
from test_degenerate_events import ENTRIES
from test_oracle_differential import TABLES

REAL_SF = "/root/testdata/sf0.001"

_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
# six instants: one shared burst second, a sub-second neighbor, an
# hour boundary, a day boundary, a far-future point, and NULL
_TS = [
    _T0,
    _T0,
    _T0 + dt.timedelta(seconds=1),
    _T0 + dt.timedelta(minutes=59, seconds=59),
    _T0 + dt.timedelta(days=1),
    _T0 + dt.timedelta(days=45),
    None,
]
_TYPES = ["click", "view", "purchase", "signup", "weird", "", None]
# NaN/±inf added r11: comparison/min/max/avg/round semantics probed
# identical cross-engine (both treat NaN as largest and NaN-equal);
# only string RENDERING differs ('Infinity' vs 'inf'), which the
# parity rules already forbid in oracle outputs
_VALUES = [0.0, 1.5, -2.0, 128.125, 128.125, None,
           float("nan"), float("inf"), float("-inf")]
_PROPS = ['{"k": 1}', '{"k": 2, "s": "x"}', "not json", "{}", "", None]


def _pick(rng: np.random.RandomState, pool, n):
    return [pool[i] for i in rng.randint(0, len(pool), n)]


def _build_corpus(seed: int, d: str) -> None:
    rng = np.random.RandomState(seed)
    n = 400
    events = pa.table(
        {
            # unique-or-NULL event ids (PK contract, as in the orders fuzz)
            "event_id": pa.array(
                [
                    None if rng.rand() < 0.05 else int(k)
                    for k in rng.permutation(n)
                ],
                pa.int64(),
            ),
            "ts": pa.array(_pick(rng, _TS, n), pa.timestamp("us")),
            "user_id": pa.array(
                [
                    None if rng.rand() < 0.05 else int(u)
                    for u in rng.randint(0, 8, n)
                ],
                pa.int64(),
            ),
            "event_type": pa.array(_pick(rng, _TYPES, n), pa.string()),
            "value": pa.array(_pick(rng, _VALUES, n), pa.float64()),
            "props": pa.array(_pick(rng, _PROPS, n), pa.string()),
        }
    )
    for name in TABLES:
        if name != "events":
            shutil.copy(f"{REAL_SF}/{name}.parquet", f"{d}/{name}.parquet")
    pq.write_table(events, f"{d}/events.parquet")


@pytest.fixture(scope="module", params=[11, 2026, 101])
def fuzz_dir(request, tmp_path_factory):
    # 101 pinned r9: the exploration sweep's only find — a keyless click
    # tied with a purchase was visible to it on one engine only
    # (funnel_time_to_convert); neither original seed placed that tie
    d = tmp_path_factory.mktemp(f"fuzz_ev_{request.param}")
    _build_corpus(request.param, str(d))
    return str(d)


@pytest.mark.parametrize("name", ENTRIES)
def test_events_entry_survives_random_corpus(spark, fuzz_dir, name):
    assert_entry_matches(spark, name, fuzz_dir, "random events corpus")
