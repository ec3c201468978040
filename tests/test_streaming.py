"""Structured Streaming over events: the streaming plan must produce the
same aggregates as its batch twin (availableNow drain to memory sink)."""

from __future__ import annotations

import pytest

from pytrousse_spark import read_parquet_df
from pytrousse_spark.streaming.events import (
    read_events_stream,
    run_stream_to_memory,
    sessionize,
    windowed_event_counts,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_batch(spark):
    return read_parquet_df(spark, f"{SF_DIR}/events.parquet")


@pytest.fixture(scope="module")
def events_stream_dir(tmp_path_factory):
    # the file-source needs a directory; testdata is read-only single files
    import shutil

    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-000.parquet")
    return str(d)


def _normalize(rows):
    return sorted(
        tuple(r[c] for c in sorted(r.asDict())) for r in rows
    )


def test_stream_matches_batch_windowed_counts(spark, events_batch, events_stream_dir):
    stream = read_events_stream(spark, events_stream_dir)
    assert stream.isStreaming
    agg = windowed_event_counts(stream, "1 hour", "2 hours")
    run_stream_to_memory(agg, "win_counts")
    got = spark.sql("SELECT * FROM win_counts").collect()
    expect = windowed_event_counts(events_batch, "1 hour").collect()
    assert _normalize(got) == _normalize(expect)
    assert len(got) > 0


def test_stream_sessionize_runs(spark, events_stream_dir):
    stream = read_events_stream(spark, events_stream_dir)
    sess = sessionize(stream, gap="30 minutes")
    run_stream_to_memory(sess, "sessions")
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert len(rows) > 0
    assert all(r["session_end"] >= r["session_start"] for r in rows)
    assert all(r["n_events"] >= 1 for r in rows)
