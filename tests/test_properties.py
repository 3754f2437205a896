"""Property-based tests (hypothesis) for the operators with the subtlest
semantics: cross-engine rounding, as-of joins, sessionization."""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_engineering_project_capstone_spark.streaming.events import sessionize_batch

SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    xs=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(**SETTINGS)
def test_ieee_round_matches_duckdb(spark, xs):
    """ieee_round must be bit-identical between Spark and DuckDB for any
    input double — the foundation of the oracle gate's float policy."""
    sdf = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], ["i", "x"])
    from data_engineering_project_capstone_spark.functions.scalar import ieee_round

    got = {
        r["i"]: r["y"]
        for r in sdf.select("i", ieee_round("x", 2).alias("y")).collect()
    }
    con = duckdb.connect()
    expect = {
        i: con.execute(
            "SELECT floor((CAST(? AS DOUBLE) * 100.0) + 0.5) / 100.0", [x]
        ).fetchone()[0]
        for i, x in enumerate(xs)
    }
    assert got == expect


@given(
    left_ts=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=30),
    right_ts=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=30),
)
@settings(**SETTINGS)
def test_asof_join_matches_merge_asof(spark, left_ts, right_ts):
    """asof_join must agree with pandas.merge_asof (backward direction)
    on a single key with unique right timestamps."""
    from data_engineering_project_capstone_spark.operators.asof import asof_join

    right_ts = sorted(set(right_ts))
    base = dt.datetime(2024, 1, 1)
    lrows = [
        (i, 1, base + dt.timedelta(seconds=s)) for i, s in enumerate(sorted(left_ts))
    ]
    rrows = [
        (100 + j, 1, base + dt.timedelta(seconds=s), float(s))
        for j, s in enumerate(right_ts)
    ]
    left = spark.createDataFrame(lrows, ["lid", "k", "ts"])
    right = spark.createDataFrame(rrows, ["rid", "k", "ts", "payload"])
    got = (
        asof_join(left, right, on=["k"], right_cols=["rid", "payload"])
        .orderBy("lid")
        .collect()
    )
    lpd = pd.DataFrame(lrows, columns=["lid", "k", "ts"]).sort_values("ts")
    rpd = pd.DataFrame(rrows, columns=["rid", "k", "ts", "payload"]).sort_values("ts")
    expect = pd.merge_asof(lpd, rpd, on="ts", by="k", direction="backward")
    expect = expect.sort_values("lid")
    for g, (_, e) in zip(got, expect.iterrows()):
        assert g["lid"] == e["lid"]
        if pd.isna(e["rid"]):
            assert g["asof_rid"] is None
        else:
            assert g["asof_rid"] == e["rid"], (g, e)


@given(
    gaps=st.lists(st.integers(min_value=1, max_value=7200), min_size=1, max_size=40),
)
@settings(**SETTINGS)
def test_sessionize_invariants(spark, gaps):
    """Sessions partition the events; boundaries exactly at gap>30min."""
    base = dt.datetime(2024, 1, 1)
    ts, acc = [], 0
    for g in gaps:
        acc += g
        ts.append(base + dt.timedelta(seconds=acc))
    rows = [(i, t, 1, 1.0) for i, t in enumerate(ts)]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    sessions = sessionize_batch(df, gap_minutes=30).collect()
    # invariant 1: session event counts partition all events
    assert sum(r["n_events"] for r in sessions) == len(rows)
    # invariant 2: number of sessions == 1 + #gaps > 30min (first event
    # opens a session; the generated inter-arrival gaps are exactly `gaps`
    # after the first event)
    n_breaks = sum(1 for g in gaps[1:] if g > 1800)
    assert len(sessions) == 1 + n_breaks
    # invariant 3: sessions don't overlap per user
    spans = sorted((r["session_start"], r["session_end"]) for r in sessions)
    for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
        assert e1 < s2


@given(
    toks=st.lists(st.integers(min_value=1, max_value=400), min_size=1, max_size=60),
)
@settings(**SETTINGS)
def test_token_budget_semantics(spark, toks):
    """source_token_budget's gate (via chunked_running_offset): kept docs
    are a PREFIX of the hash order, their total stays ≤ budget, and the
    first excluded doc would have pushed it over."""
    from data_engineering_project_capstone_spark.operators.packing import (
        chunked_running_offset,
    )
    from pyspark.sql import functions as F

    budget = 800
    rows = [(i, "s", n, f"{i:032x}") for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tok", "h"])
    cum = chunked_running_offset(df, "source", "h", "doc_id", "n_tok", out_col="cum")
    kept = sorted(
        (r["doc_id"], r["n_tok"], r["cum"])
        for r in cum.filter(F.col("cum") + F.col("n_tok") <= budget).collect()
    )
    # hash order here == doc_id order (h is the zero-padded id)
    total = 0
    expect = []
    for i, n in enumerate(toks):
        if total + n <= budget:
            expect.append((i, n, total))
        total += n  # exclusion doesn't reset the running offset
    assert kept == expect


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["en", "de", "fr"]),          # part
            st.integers(min_value=0, max_value=2**32 - 1),  # hash material
            st.integers(min_value=1, max_value=500),        # value
        ),
        min_size=1,
        max_size=50,
    ),
)
@settings(**SETTINGS)
def test_chunked_running_offset_equals_single_window(spark, rows):
    """The two-pass chunked layout must be bit-identical to the plain
    per-part running sum for ARBITRARY hash orderings (not just ordered
    ids) — chunk boundaries may fall anywhere in the order."""
    from data_engineering_project_capstone_spark.operators.packing import (
        chunked_running_offset,
    )

    data = [
        (i, part, f"{h:08x}" + f"{i:024x}", v)
        for i, (part, h, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, ["doc_id", "part", "h", "n"])
    got = {
        r["doc_id"]: r["cum"]
        for r in chunked_running_offset(
            df, "part", "h", "doc_id", "n", out_col="cum"
        ).collect()
    }
    # reference: python cumsum per part in (h, doc_id) order
    expect = {}
    for part in {p for _, p, _, _ in data}:
        acc = 0
        for doc_id, _, h, v in sorted(
            (d for d in data if d[1] == part), key=lambda d: (d[2], d[0])
        ):
            expect[doc_id] = acc
            acc += v
    assert got == expect


@given(
    items=st.lists(
        st.text(
            alphabet="abcdefg", min_size=1, max_size=4
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(**SETTINGS)
def test_md5_bucket_matches_duckdb_and_cms_dominates(spark, items):
    """Two properties on arbitrary token multisets: (1) md5_bucket is
    bit-identical to its documented DuckDB twin (the cross-engine
    contract every sketch/split entry rests on); (2) the CMS built from
    the multiset never underestimates any item's true count."""
    from collections import Counter

    from pyspark.sql import functions as F

    from data_engineering_project_capstone_spark.functions.scalar import (
        md5_bucket,
    )
    from data_engineering_project_capstone_spark.streaming.sketches import (
        cms_cells,
        cms_estimate,
    )

    sdf = spark.createDataFrame([(x,) for x in items], ["item"])
    got = {
        (r["item"], r["b"])
        for r in sdf.select(
            "item", md5_bucket(F.col("item"), F.lit("0"), 256).alias("b")
        )
        .distinct()
        .collect()
    }
    con = duckdb.connect()
    expect = {
        (x, b)
        for x in set(items)
        for (b,) in con.execute(
            "SELECT CAST(concat('0x', substring(md5(concat(?, ':', '0')),"
            " 1, 15)) AS BIGINT) % 256",
            [x],
        ).fetchall()
    }
    assert got == expect

    sketch = cms_cells(sdf, "item").groupBy("d", "bucket").agg(
        F.sum("cell").alias("cell")
    )
    est = {
        r["item"]: r["est"]
        for r in cms_estimate(sketch, sdf, "item").collect()
    }
    truth = Counter(items)
    for item, n in truth.items():
        assert est[item] >= n, (item, est[item], n)


@given(
    left_ts=st.lists(st.integers(min_value=0, max_value=2_000), min_size=1, max_size=25),
    right_ts=st.lists(st.integers(min_value=0, max_value=2_000), min_size=1, max_size=25),
    tol=st.integers(min_value=0, max_value=500),
)
@settings(**SETTINGS)
def test_asof_join_tolerance_matches_merge_asof(spark, left_ts, right_ts, tol):
    """asof_join(tolerance_seconds=...) must agree with
    pandas.merge_asof(tolerance=...) — matches older than the bound
    are nulled, not substituted with an older row."""
    from data_engineering_project_capstone_spark.operators.asof import asof_join

    right_ts = sorted(set(right_ts))
    base = dt.datetime(2024, 1, 1)
    lrows = [
        (i, 1, base + dt.timedelta(seconds=s)) for i, s in enumerate(sorted(left_ts))
    ]
    rrows = [
        (100 + j, 1, base + dt.timedelta(seconds=s), float(s))
        for j, s in enumerate(right_ts)
    ]
    left = spark.createDataFrame(lrows, ["lid", "k", "ts"])
    right = spark.createDataFrame(rrows, ["rid", "k", "ts", "payload"])
    got = (
        asof_join(
            left, right, on=["k"], right_cols=["rid", "payload"],
            tolerance_seconds=tol,
        )
        .orderBy("lid")
        .collect()
    )
    lpd = pd.DataFrame(lrows, columns=["lid", "k", "ts"]).sort_values("ts")
    rpd = pd.DataFrame(rrows, columns=["rid", "k", "ts", "payload"]).sort_values("ts")
    expect = pd.merge_asof(
        lpd, rpd, on="ts", by="k", direction="backward",
        tolerance=pd.Timedelta(seconds=tol),
    ).sort_values("lid")
    for g, (_, e) in zip(got, expect.iterrows()):
        assert g["lid"] == e["lid"]
        if pd.isna(e["rid"]):
            assert g["asof_rid"] is None, (g, e)
        else:
            assert g["asof_rid"] == e["rid"], (g, e)


def test_asof_join_rejects_reserved_rts_column(spark):
    """'_rts' is the internal right-timestamp field inside the carried
    struct; a same-named payload column would make getField ambiguous."""
    import datetime as _dt

    from data_engineering_project_capstone_spark.operators.asof import asof_join

    base = _dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, 1, base)], ["lid", "k", "ts"])
    right = spark.createDataFrame([(1, base, 1.0)], ["k", "ts", "_rts"])
    with pytest.raises(ValueError, match="_rts"):
        asof_join(left, right, on=["k"], right_cols=["_rts"])


# ---------------------------------------------------------------------------
# r8: connected_components vs union-find on arbitrary random graphs —
# including EMPTY edge sets, duplicate/self edges, and chains whose
# diameter lands exactly on / just over the iteration budget (the three
# shapes the r8 fixes touched: vacuous fixpoint, confirm round,
# under-merge warning).
# ---------------------------------------------------------------------------


def _uf(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-label canonicalization
    return {x: find(x) for x in parent}


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=0,
        max_size=40,
    ),
)
@settings(**{**SETTINGS, "max_examples": 10})  # each example is a full
# 10-round distributed CC (~5s) — 10 random graphs is the wall-time
# budget; the seeded test_clusters matrix keeps the fixed coverage
def test_connected_components_matches_union_find(spark, edges):
    import warnings as _warnings

    from data_engineering_project_capstone_spark.operators.clusters import (
        connected_components,
    )

    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges or [(0, 0)], ["id_a", "id_b"])
    if not edges:
        df = df.filter("id_a <> id_a")  # genuinely empty edge set
    with _warnings.catch_warnings():
        # 31 nodes / budget 10: a worst-case chain may legitimately
        # under-merge and warn; the property below only asserts
        # exactness when no warning fired.
        _warnings.simplefilter("always")
        caught: list = []
        _warnings.showwarning = lambda *a, **k: caught.append(a)
        got = {
            r["id"]: r["component"]
            for r in connected_components(df, max_iterations=10).collect()
        }
    expect = _uf(edges)
    if not caught:
        assert got == expect
    else:
        # under-merge contract: every emitted component is a SUBSET of a
        # true component (never a mix), and labels are min-monotone
        assert set(got) == set(expect)
        for node, comp in got.items():
            assert comp <= node
            assert expect[comp] == expect[node], (node, comp)


def test_connected_components_confirm_round_silences_exact_budget(spark):
    """A path of diameter exactly max_iterations converges on the final
    round; the r8 confirm round must return quietly (no spurious
    under-merge warning) with exact labels."""
    import warnings as _warnings

    from data_engineering_project_capstone_spark.operators.clusters import (
        connected_components,
    )

    edges = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")  # any RuntimeWarning -> failure
        got = connected_components(df, max_iterations=12).collect()
    assert all(r["component"] == 0 for r in got)


def test_connected_components_zero_budget_warns_without_work(spark):
    from data_engineering_project_capstone_spark.operators.clusters import (
        connected_components,
    )

    edges = [(0, 1), (1, 2)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    with pytest.warns(RuntimeWarning, match="zero propagation rounds"):
        got = {
            r["id"]: r["component"]
            for r in connected_components(df, max_iterations=0).collect()
        }
    # initial min-neighbor seed only — node 2 has not seen 0 yet
    assert got == {0: 0, 1: 0, 2: 1}


@given(
    name=st.one_of(
        st.none(),
        st.text(
            alphabet=st.sampled_from(list("ab c")),
            max_size=12,
        ),
    )
)
@settings(**SETTINGS)
def test_string_split_get_matches_python(spark, name):
    """r8: F.get on a split array returns NULL for a missing token (the
    ANSI-safe replacement for getItem) — matches Python split semantics
    for index 0/1 on any input including None, '', and 1-token names."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(name,)], "p_name string")
    [row] = df.select(
        F.get(F.split(F.col("p_name"), " "), 0).alias("adj"),
        F.get(F.split(F.col("p_name"), " "), 1).alias("noun"),
    ).collect()
    if name is None:
        assert row["adj"] is None and row["noun"] is None
    else:
        parts = name.split(" ")
        assert row["adj"] == parts[0]
        assert row["noun"] == (parts[1] if len(parts) > 1 else None)
