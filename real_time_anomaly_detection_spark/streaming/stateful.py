"""Custom stateful streaming: per-key running statistics + online anomaly
flagging via `applyInPandasWithState`.

Recasts the reference's continuous detection loop (every 600 s the collector
ingests and the detector re-reads a sliding window, `streaming_collector_
sqlite.py:417-425` + `anomaly_detector.py:42-58`) as TRUE streaming state:
instead of re-scanning the window each cycle, per-key aggregates live in the
state store and update incrementally per micro-batch — O(1) state per key
(Welford running mean/M2), no re-read, exactly the upgrade Structured
Streaming's state store exists for (SURVEY.md §2.9 noted the reference has no
custom state; the engine adds it).

Semantics (reference parity where it applies):
- a point is flagged iff the key's PRIOR state has n >= min_points and
  |x - mean| > threshold * stddev_pop — the same 3-sigma rule as U1, applied
  online with the statistics as-of arrival time (the batch detector sees the
  whole window at once; the online detector never looks ahead);
- state: (n, mean, M2) per key — Welford update is associative enough for
  within-batch sequential fold ordered by event time;
- timeout: keys idle past `state_ttl` are evicted (GroupStateTimeout
  ProcessingTimeTimeout), bounding state like the reference's bounded window.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("m2", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("running_mean", T.DoubleType()),
        T.StructField("running_std", T.DoubleType()),
        T.StructField("is_anomaly", T.BooleanType()),
    ]
)


def _flag_and_update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    threshold: float,
    min_points: int,
    emit_all: bool,
) -> Iterator[pd.DataFrame]:
    n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
    rows: list[dict[str, Any]] = []
    # Concatenate ALL Arrow chunks before sorting: a per-chunk sort would
    # fold values out of global event-time order whenever one key's
    # micro-batch spans chunk boundaries, making flags chunk-dependent.
    # Per-key micro-batch volume is bounded (module doc), so this is safe.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values("ts", kind="stable")
        for ts, v in zip(pdf["ts"], pdf["value"]):
            x = float(v)
            std = (m2 / n) ** 0.5 if n > 0 else 0.0  # population std (U1 parity)
            flagged = bool(n >= min_points and std > 0 and abs(x - mean) > threshold * std)
            if flagged or emit_all:
                rows.append(
                    {
                        "key": key[0],
                        "ts": ts,
                        "value": x,
                        "n_seen": n,
                        "running_mean": mean,
                        "running_std": std,
                        "is_anomaly": flagged,
                    }
                )
            # Welford update AFTER the verdict: stats are as-of arrival
            n += 1
            d = x - mean
            mean += d / n
            m2 += d * (x - mean)
    state.update((n, mean, m2))
    yield pd.DataFrame(rows, columns=[f.name for f in OUTPUT_SCHEMA.fields])


def running_anomalies(
    events: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    threshold: float = 3.0,
    min_points: int = 10,
    emit_all: bool = False,
    state_ttl: str | None = None,
) -> DataFrame:
    """Streaming (or batch-tested via availableNow drains) online 3-sigma:
    one state-store entry per key, updated incrementally per micro-batch.

    `emit_all=True` emits every row with its running stats (test/debug);
    default emits anomaly records only (W4 mask->records shape)."""
    prepped = events.select(
        events[key_col].cast("string").alias("key"),
        events[ts_col].alias("ts"),
        events[value_col].cast("double").alias("value"),
    )

    def fn(key, pdfs, state):
        if state.hasTimedOut:  # idle key evicted: drop state, emit nothing
            state.remove()
            return iter(
                [pd.DataFrame(columns=[f.name for f in OUTPUT_SCHEMA.fields])]
            )
        if state_ttl:
            state.setTimeoutDuration(state_ttl)
        return _flag_and_update(key, pdfs, state, threshold, min_points, emit_all)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if state_ttl else GroupStateTimeout.NoTimeout
    )
    return prepped.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
