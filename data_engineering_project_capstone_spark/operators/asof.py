"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the most recent right row with right.ts ≤ left.ts
within the same key. Implemented as a composition of existing DataFrame ops
(SURVEY build rule: composition first, pandas fallback only if semantics
demand):

    union(tagged left, tagged right)
    → window per key ordered by (ts, right-first-at-ties)
    → last(right-row STRUCT, ignoreNulls) over unbounded-preceding
    → keep left rows, unpack the struct

The right row travels as ONE struct, so a null payload column can never be
back-filled from an older right row (the bug the per-column variant has).

Cost: one shuffle on the key + a per-key sort — same as any windowed op,
no range-bucketing needed, and it inherits AQE skew handling. This beats a
`merge_asof` pandas fallback (Arrow round-trip per batch) and is what a
1000-executor cluster wants: narrow after the single shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    prefix: str = "asof_",
    tiebreak: str | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: every left row + the latest right row at-or-before
    its timestamp (per key). Right payload columns come back as
    ``{prefix}{col}``; unmatched left rows keep them null.

    ``tiebreak``: optional right-side column that orders right rows sharing
    a timestamp (the greatest wins — deterministic). Passing a tiebreak
    EXCLUDES right rows whose tiebreak is NULL — even rows not actually
    tied on (key, ts): the column is declared to be the match-order
    identity, and a row with a NULL identity has no defined position in
    that order (SQL engines order NULLs arbitrarily within a tie, so
    keeping them is a cross-engine divergence, not a semantics). Callers
    with a sparsely-populated tiebreak column should coalesce it to a
    sentinel first if those rows must stay matchable.

    ``tolerance_seconds``: pandas-merge_asof-style bound — a match older
    than this is nulled out AFTER the carry-forward fill (the struct
    carries the right timestamp, so the window itself is unchanged: one
    shuffle, same plan, a post-filter instead of a range join).
    """
    on = list(on)
    # A timeless or keyless right row can never be "the most recent
    # right row at-or-before ts for this key": a NULL right_ts fails
    # every ts-comparison semantics (SQL `r.ts <= l.ts` is never true),
    # yet inside the union-window it would sort into the NULLS-FIRST
    # region and CARRY FORWARD into every left row of the partition;
    # a NULL key would form an "anonymous" partition matching across
    # keyless rows that SQL key-equality never matches (random-events
    # fuzz net). Left rows with NULL ts/key keep a NULL payload: with
    # the degenerate rights removed, nothing precedes them.
    right = right.filter(F.col(right_ts).isNotNull())
    for k in on:
        right = right.filter(F.col(k).isNotNull())
    if tiebreak is not None:
        # the tiebreak contract is "greatest wins" — two rows tied on
        # (key, ts) with NULL tiebreaks have no defined order on either
        # engine (each picks arbitrarily), so a NULL-tiebreak right row
        # has no position in the match order at all
        right = right.filter(F.col(tiebreak).isNotNull())
    right_cols = list(right_cols) or [
        c for c in right.columns if c not in (*on, right_ts)
    ]
    if "_rts" in right_cols:
        # The carried struct smuggles the right timestamp under this
        # internal field; a same-named payload column would make the
        # getField lookups ambiguous.
        raise ValueError(
            "asof_join: '_rts' is reserved for the internal right-timestamp "
            "field; rename the right-side column"
        )

    r_struct = F.struct(
        F.col(right_ts).alias("_rts"), *[F.col(c) for c in right_cols]
    ).alias("_r")
    rt = right.select(
        *on,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_is_left"),
        r_struct,
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("_tb"),
    )
    lt = left.select(
        *left.columns,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(rt.schema["_r"].dataType).alias("_r"),
        F.lit(None).cast(rt.schema["_tb"].dataType).alias("_tb"),
    )
    left_only = [c for c in left.columns if c not in on]
    rt_full = rt.select(
        *on,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_only],
        "_ats",
        "_is_left",
        "_r",
        "_tb",
    )
    combined = lt.unionByName(rt_full)

    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col("_ats").asc(),
            F.col("_is_left").asc(),  # right rows sort before left at equal ts
            F.col("_tb").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = combined.withColumn(
        "_r_filled", F.last(F.col("_r"), ignorenulls=True).over(w)
    )
    if tolerance_seconds is not None:
        in_tol = (
            F.unix_micros(F.col("_ats"))
            - F.unix_micros(F.col("_r_filled").getField("_rts"))
        ) <= tolerance_seconds * 1_000_000
        filled = filled.withColumn(
            "_r_filled", F.when(in_tol, F.col("_r_filled"))
        )
    return (
        filled.filter(F.col("_is_left") == 1)
        .select(
            *left.columns,
            *[
                F.col("_r_filled").getField(c).alias(f"{prefix}{c}")
                for c in right_cols
            ],
        )
    )
