"""Stateful streaming sessionization (applyInPandasWithState): in-batch
gap splits, event-time-timeout closes, exactly-once emission."""

from __future__ import annotations

import datetime as dt
import shutil

import pytest

from pdf_ocr_spark.streaming.stateful import stream_sessionize
from tests.test_streaming_windows import SCHEMA, _t, _write


@pytest.fixture()
def dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("in", "out", "ckpt")}
    yield d
    for p in d.values():
        shutil.rmtree(p, ignore_errors=True)


def _run(spark, dirs):
    q = stream_sessionize(
        spark, dirs["in"], dirs["out"], dirs["ckpt"], SCHEMA,
        gap="15 minutes", watermark="10 minutes",
    )
    assert q.awaitTermination(300), "streaming run did not finish"


def _sessions(spark, dirs):
    return {
        (r.key, r.session_start): (r.session_end, r.n_events)
        for r in spark.read.parquet(dirs["out"]).collect()
    }


def test_gap_split_and_timeout_close(spark, dirs):
    events = (
        [(_t(10, m), "a") for m in (0, 5, 10)]     # session 1: 10:00-10:10
        + [(_t(10, 40), "a"), (_t(10, 45), "a")]   # gap 30m -> session 2
        + [(_t(10, 7), "b")]                       # one-event session
        + [(_t(12, 0), "flush")]                   # watermark -> 11:50
    )
    _write(spark, dirs["in"], events)
    _run(spark, dirs)

    got = _sessions(spark, dirs)
    # session 1 closed by the in-batch gap, session 2 by event-time timeout
    assert got[("a", _t(10, 0))] == (_t(10, 10), 3)
    assert got[("a", _t(10, 40))] == (_t(10, 45), 2)
    assert got[("b", _t(10, 7))] == (_t(10, 7), 1)
    # the flush key's own session is still open (watermark hasn't passed it)
    assert ("flush", _t(12, 0)) not in got


def test_state_survives_restart_and_extends_session(spark, dirs):
    _write(spark, dirs["in"], [(_t(10, 0), "a"), (_t(10, 5), "a")])
    _run(spark, dirs)
    assert _sessions(spark, dirs) == {}  # session still open in state

    # next drop extends the same session (gap 10m < 15m), then closes it
    _write(spark, dirs["in"], [(_t(10, 15), "a"), (_t(11, 30), "flush")])
    _run(spark, dirs)

    got = _sessions(spark, dirs)
    assert got[("a", _t(10, 0))] == (_t(10, 15), 3)
