"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (the engine's arbitrary-state path; the
windowed path is streaming/windows.py).

Semantics: events for a key belong to one session while consecutive
event-time gaps stay <= ``gap``; a session closes when a bigger gap
arrives in-batch, or when the watermark passes ``last_event + gap``
(event-time timeout).  Closed sessions are appended exactly once:
(key, session_start, session_end, n_events).

This is the streaming twin of the batch sessionization query
(q13_sessionize_events — lag/cumsum windows); the batch query is the
oracle for the closed sessions, which is what the test asserts.

Scale notes: state per key is three longs (start, last, count) — bounded
by key cardinality, not event volume; the watermark bounds how long an
idle key's state lives.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

OUTPUT_SCHEMA = (
    "key string, session_start timestamp, session_end timestamp, "
    "n_events long"
)
STATE_SCHEMA = "start long, last long, n long"

_MS = 1_000_000  # pandas timestamps are ns; state stores ms


def _session_row(key: str, start_ms: int, last_ms: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "key": [key],
            "session_start": [pd.Timestamp(start_ms * _MS)],
            "session_end": [pd.Timestamp(last_ms * _MS)],
            "n_events": [n],
        }
    )


def make_sessionizer(gap_ms: int):
    """Returns the applyInPandasWithState function for a given gap."""

    def sessionize(
        key: tuple, pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield _session_row(k, start, last, n)
            return

        ts_ms = []
        for pdf in pdfs:
            ts_ms.extend(int(t.value // _MS) for t in pdf["ts"])
        ts_ms.sort()

        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts_ms[0], ts_ms[0], 0

        for t in ts_ms:
            if t - last > gap_ms:
                yield _session_row(k, start, last, n)
                start, n = t, 0
            last = t
            n += 1

        state.update((start, last, n))
        # close the open session when event time passes last + gap
        state.setTimeoutTimestamp(last + gap_ms)

    return sessionize


def stream_sessionize(
    spark,
    input_path: str,
    output_path: str,
    checkpoint_dir: str,
    schema,
    gap: str = "15 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "kind",
):
    """File-stream -> stateful sessionization -> parquet append."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_ms = _parse_ms(gap)
    stream = (
        spark.readStream.schema(schema)
        .parquet(input_path)
        .withWatermark(ts_col, watermark)
        .withColumnRenamed(key_col, "key")
        .withColumnRenamed(ts_col, "ts")
    )
    sessions = stream.groupBy("key").applyInPandasWithState(
        make_sessionizer(gap_ms),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
    return (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _parse_ms(spec: str) -> int:
    n, unit = spec.split()
    mult = {
        "second": 1_000, "seconds": 1_000,
        "minute": 60_000, "minutes": 60_000,
        "hour": 3_600_000, "hours": 3_600_000,
    }[unit]
    return int(n) * mult
