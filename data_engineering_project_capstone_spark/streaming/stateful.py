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


# ---------------------------------------------------------------------------
# Same operator on the Spark 4 transformWithStateInPandas API
# ---------------------------------------------------------------------------

try:  # gate: needs Spark >= 4 AND google.protobuf in the Python env
    # (the TWS state protocol is protobuf-framed between the JVM and the
    # Python driver worker — absent protobuf the query crashes at init;
    # this container ships without it, so the runtime test skips there)
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class AnomalyProcessor(StatefulProcessor):
        """transformWithStateInPandas twin of :func:`anomaly_monitor` —
        identical semantics (sequential per-user running-mean anomaly
        count), expressed on the successor API: typed value state from a
        handle instead of a GroupState argument, timers available (unused
        here), and the same Arrow-batched pandas dataflow.

        The old and new operators share :func:`anomaly_monitor_batch` as
        their batch oracle; the stream-equivalence test runs BOTH against
        it, so the two APIs are pinned to byte-identical outputs."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._acc = handle.getValueState("acc", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            n, total, n_anom = (
                self._acc.get() if self._acc.exists() else (0, 0.0, 0)
            )
            for pdf in rows:
                pdf = pdf.sort_values("ts")
                for v in pdf["value"]:
                    mean = total / n if n else None
                    if mean is not None and v > 3.0 * mean:
                        n_anom += 1
                    n += 1
                    total += float(v)
            self._acc.update((n, total, n_anom))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "running_mean": [round(total / n, 4) if n else None],
                    "n_anomalies": [n_anom],
                }
            )

        def close(self) -> None:
            pass

    def anomaly_monitor_tws(events: DataFrame) -> DataFrame:
        """anomaly_monitor on transformWithStateInPandas (Spark 4 API)."""
        return events.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=AnomalyProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )

except ImportError:  # pragma: no cover - older Spark

    def anomaly_monitor_tws(events: DataFrame) -> DataFrame:
        raise NotImplementedError(
            "transformWithStateInPandas requires Spark >= 4.0; use "
            "anomaly_monitor (applyInPandasWithState) instead."
        )
