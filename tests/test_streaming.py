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


def test_stream_sessionize_matches_batch(spark, events_batch, events_stream_dir):
    """The availableNow session-window drain equals the batch twin — and the
    batch twin is the oracle-gated q89, so the stream sits transitively
    behind the DuckDB hash gate."""
    stream = read_events_stream(spark, events_stream_dir)
    sess = sessionize(stream, gap="30 minutes")
    run_stream_to_memory(sess, "sessions_parity")
    got = spark.sql("SELECT * FROM sessions_parity").collect()
    expect = sessionize(events_batch, gap="30 minutes").collect()
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


def test_stream_dedup_suppresses_cross_file_duplicates(
    spark, events_batch, tmp_path_factory
):
    """Same parquet file delivered twice (two triggers) — the watermarked
    streaming dedup must emit each event_id once, matching the batch twin."""
    import shutil

    from pytrousse_spark.streaming.events import dedup_events_stream

    d = tmp_path_factory.mktemp("events_dup_stream")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-000.parquet")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-001.parquet")

    stream = read_events_stream(spark, str(d))
    deduped = dedup_events_stream(stream).select("event_id")
    run_stream_to_memory(deduped, "dedup_stream", output_mode="append")
    got = spark.table("dedup_stream").collect()

    expected = dedup_events_stream(events_batch).count()
    assert len(got) == expected
    assert len({r["event_id"] for r in got}) == len(got)


def test_stream_runs_stateless_text_operators(spark, tmp_path_factory):
    """Expression-compiled operators (minhash signatures, quality scores)
    apply to a stream unchanged — no batch-only constructs in the hot path."""
    import shutil

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from pytrousse_spark.functions.text import quality_score
    from pytrousse_spark.operators.dedup import with_minhash_signature

    d = tmp_path_factory.mktemp("docs_stream")
    shutil.copy(f"{SF_DIR}/documents.parquet", d / "part-000.parquet")
    schema = spark.read.parquet(str(d)).schema
    docs = spark.readStream.schema(schema).parquet(str(d))

    out = with_minhash_signature(docs, "text", num_perm=8).withColumn(
        "quality", quality_score(F.col("text"))
    )
    run_stream_to_memory(
        out.select("doc_id", "__sig", "quality"), "docs_stream",
        output_mode="append",
    )
    got = {r["doc_id"]: (tuple(r["__sig"]), r["quality"])
           for r in spark.table("docs_stream").collect()}

    batch = with_minhash_signature(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"), "text", num_perm=8
    ).withColumn("quality", quality_score(F.col("text")))
    want = {r["doc_id"]: (tuple(r["__sig"]), r["quality"])
            for r in batch.select("doc_id", "__sig", "quality").collect()}
    assert got == want


def test_stream_gate_documents_matches_batch(spark, tmp_path_factory):
    """The corpus gates (lang/quality/length) are stateless expressions, so
    the SAME operator runs on a document stream — the ingestion-time filter
    in front of a streaming sink. Stream drain must equal the batch twin."""
    import shutil

    from pytrousse_spark.operators.corpus import gate_documents

    d = tmp_path_factory.mktemp("docs_stream")
    shutil.copy(f"{SF_DIR}/documents.parquet", d / "part-000.parquet")
    batch = read_parquet_df(spark, f"{SF_DIR}/documents.parquet")
    stream = spark.readStream.schema(batch.schema).parquet(str(d))
    assert stream.isStreaming
    gated = gate_documents(stream).drop("__fp")
    run_stream_to_memory(gated, "gated_docs", output_mode="append")
    got = spark.sql("SELECT * FROM gated_docs").collect()
    expect = gate_documents(batch).drop("__fp").collect()
    assert _normalize(got) == _normalize(expect)
    assert len(got) > 0


def test_stream_static_enrichment_matches_batch(spark, events_batch, events_stream_dir):
    """Stream-static broadcast join + agg drains to the same result as the
    batch twin."""
    from pyspark.sql import functions as F
    from pytrousse_spark.streaming.events import enrich_events_stream

    dim = spark.createDataFrame(
        [(i, "heavy" if i % 3 == 0 else "light") for i in range(200)],
        ["user_id", "segment"],
    )
    stream = read_events_stream(spark, events_stream_dir)
    agg = enrich_events_stream(stream, dim)
    run_stream_to_memory(agg, "enriched")
    got = spark.sql("SELECT * FROM enriched").collect()
    expect = enrich_events_stream(events_batch, dim).collect()
    assert _normalize(got) == _normalize(expect)
    assert {r["segment"] for r in got} == {"heavy", "light"}


def test_stream_near_dup_alerts_match_batch(spark, tmp_path_factory):
    """Streaming LSH band alerts (per-band state) drain to exactly the
    batch twin's result when docs arrive in id order across two files."""
    from pytrousse_spark.streaming.neardup import near_dup_band_alerts

    batch = read_parquet_df(spark, f"{SF_DIR}/documents.parquet")
    med = batch.approxQuantile("doc_id", [0.5], 0.0)[0]
    d = tmp_path_factory.mktemp("docs_neardup_stream")
    batch.where(f"doc_id <= {med}").coalesce(1).write.parquet(str(d / "p0"))
    batch.where(f"doc_id > {med}").coalesce(1).write.parquet(str(d / "p1"))
    import glob, shutil

    files = sorted(glob.glob(str(d / "p*" ) + "/part-*.parquet"))
    sdir = tmp_path_factory.mktemp("docs_neardup_feed")
    for i, f in enumerate(files):
        shutil.copy(f, sdir / f"part-{i:03d}.parquet")

    stream = spark.readStream.schema(batch.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(sdir))
    alerts = near_dup_band_alerts(stream, "text", "doc_id", num_perm=8, bands=4)
    run_stream_to_memory(alerts, "band_alerts", output_mode="update")
    got = {
        (r["band"], r["first_doc"], r["dup_doc"])
        for r in spark.table("band_alerts").collect()
    }
    want = {
        (r["band"], r["first_doc"], r["dup_doc"])
        for r in near_dup_band_alerts(batch, "text", "doc_id", num_perm=8, bands=4).collect()
    }
    assert got == want
    assert len(got) > 0


def test_stream_watermark_bounds_state(spark, tmp_path_factory):
    """Watermark law as Spark 4 actually guarantees it: the watermark is a
    STATE bound, not an input filter — a straggler arriving 10 hours late
    is still emitted once (update mode) but its window state is evicted in
    the very batch it arrives, and the final state holds exactly the
    windows still inside the watermark horizon. This is the contract that
    keeps a 100 TB stream's aggregation state finite."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("late_events")

    def write(path, rows):
        t0 = 1767225600_000_000_000  # 2026-01-01 00:00 UTC in ns
        table = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [t0 + int(r[1] * 3600 * 1e9) for r in rows],
                    pa.timestamp("ns"),
                ),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array(["click"] * len(rows)),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        pq.write_table(table, path)

    # batch 0: fresh events to T0+3h -> watermark T0+2h after the batch
    write(d / "a.parquet", [(1, 0.0), (2, 0.5), (3, 2.0), (4, 3.0)])
    # batch 1: one event 10h BEFORE T0 (far past watermark) + one fresh
    write(d / "b.parquet", [(5, -10.0), (6, 4.0)])
    now = _time.time()
    os.utime(d / "a.parquet", (now - 300, now - 300))
    os.utime(d / "b.parquet", (now, now))

    stream = read_events_stream(spark, str(d))
    agg = windowed_event_counts(stream, "1 hour", watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("late_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    progress = {p["batchId"]: p for p in q.recentProgress}
    # batch 1 runs with the watermark advanced by batch 0 (T0+2h)
    assert progress[1]["eventTime"]["watermark"].startswith("2026-01-01T02")
    # the straggler is emitted once but NEVER retained: batch 1 evicts the
    # closed T0 window AND the late window (created then dropped in-batch)
    assert progress[1]["stateOperators"][0]["numRowsRemoved"] == 2
    # final state = exactly the windows whose end is past the final
    # watermark (T0+3h): the T0+3h and T0+4h windows
    final = max(progress)
    assert progress[final]["eventTime"]["watermark"].startswith("2026-01-01T03")
    assert progress[final]["stateOperators"][0]["numRowsTotal"] == 2

    # batch twin (no watermark) still counts ALL six events
    batch = read_parquet_df(spark, str(d))
    twin = windowed_event_counts(batch, "1 hour")
    assert twin.agg({"n_events": "sum"}).first()[0] == 6
    assert len(twin.collect()) == 5  # events at T0 and T0+30m share a window


def test_stream_rollup_partials_merge_equals_direct(spark, tmp_path_factory):
    """Streaming incremental maintenance: per-micro-batch partials
    appended by foreachBatch merge to EXACTLY the direct rollup over all
    data (the q115 law held incrementally — no batch re-reads history)."""
    import shutil

    from pytrousse_spark.io import read_parquet_df
    from pytrousse_spark.operators.incremental import (
        merge_rollups,
        partial_rollup,
    )
    from pytrousse_spark.streaming.events import rollup_events_stream

    d = tmp_path_factory.mktemp("ev_rollup")
    batch = read_parquet_df(spark, f"{SF_DIR}/events.parquet")
    # two files -> two micro-batches under maxFilesPerTrigger=1
    a = batch.where("user_id % 2 = 0")
    b = batch.where("user_id % 2 = 1")
    a.write.mode("overwrite").parquet(str(d / "f1.parquet"))
    b.write.mode("overwrite").parquet(str(d / "f2.parquet"))
    src = tmp_path_factory.mktemp("ev_rollup_src")
    for i, sub in enumerate(("f1.parquet", "f2.parquet")):
        for f in (d / sub).glob("*.parquet"):
            shutil.copy(f, src / f"batch{i}-{f.name}")
    # the rewritten shards carry plain timestamps (not the raw nanos
    # layout read_events_stream normalizes), so stream with their schema
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    store = str(tmp_path_factory.mktemp("partials") / "store")
    rollup_events_stream(stream, ["event_type"], "value", store)
    partials = read_parquet_df(spark, store).drop("__batch")
    merged = merge_rollups([partials], ["event_type"])
    direct = partial_rollup(batch, ["event_type"], "value")
    norm = lambda df: sorted(tuple(r) for r in df.collect())
    assert norm(merged) == norm(direct)
    # more than one micro-batch actually ran
    nb = read_parquet_df(spark, store).select("__batch").distinct().count()
    assert nb >= 2


def test_stream_stream_join_matches_batch(spark, events_batch, events_stream_dir):
    """The watermarked stream-stream interval join (availableNow drain)
    equals its batch twin — and the batch twin is the oracle-gated q143,
    so the streaming plan sits transitively under the DuckDB oracle."""
    from pyspark.sql import functions as F

    from pytrousse_spark.streaming.events import view_purchase_stream_join

    stream = read_events_stream(spark, events_stream_dir)
    sv = stream.where(F.col("event_type") == "view")
    sp = stream.where(F.col("event_type") == "purchase")
    joined = view_purchase_stream_join(sv, sp, max_gap_minutes=30)
    assert joined.isStreaming
    run_stream_to_memory(joined, "ss_join", output_mode="append")
    got = spark.sql("SELECT * FROM ss_join").collect()

    bv = events_batch.where(F.col("event_type") == "view")
    bp = events_batch.where(F.col("event_type") == "purchase")
    want = view_purchase_stream_join(bv, bp, max_gap_minutes=30).collect()
    assert len(got) == len(want) > 0
    assert _normalize(got) == _normalize(want)


def test_stream_cusum_partials_equal_batch_operator(spark, tmp_path_factory):
    """Streaming CUSUM maintenance: out-of-order micro-batches append
    mergeable bucket partials; the readout over the merged store is
    BIT-equal to the batch operator over all events — including mu0,
    which the readout re-derives from the merged buckets."""
    import shutil

    from pytrousse_spark.io import read_parquet_df
    from pytrousse_spark.operators.timeseries import cusum_changepoints
    from pytrousse_spark.streaming.events import (
        cusum_events_stream,
        cusum_from_partials,
    )

    d = tmp_path_factory.mktemp("ev_cusum")
    batch = read_parquet_df(spark, f"{SF_DIR}/events.parquet")
    # split ACROSS time so later micro-batches deliver EARLIER buckets
    # (order-independence is the design claim)
    a = batch.where("day(ts) >= 15")
    b = batch.where("day(ts) < 15")
    a.write.mode("overwrite").parquet(str(d / "f1.parquet"))
    b.write.mode("overwrite").parquet(str(d / "f2.parquet"))
    src = tmp_path_factory.mktemp("ev_cusum_src")
    for i, sub in enumerate(("f1.parquet", "f2.parquet")):
        for f in (d / sub).glob("*.parquet"):
            shutil.copy(f, src / f"batch{i}-{f.name}")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    store = str(tmp_path_factory.mktemp("cusum_partials") / "store")
    cusum_events_stream(stream, store, ["event_type"])
    got = cusum_from_partials(spark, store, ["event_type"], k=2.0, h=5.0)
    want = cusum_changepoints(
        batch, "ts", "value", "day", 2.0, 5.0, ["event_type"]
    )
    norm = lambda df: sorted(tuple(r) for r in df.collect())
    assert norm(got) == norm(want)
    # more than one micro-batch actually ran
    nb = read_parquet_df(spark, store).select("__batch").distinct().count()
    assert nb >= 2


def test_stream_ohlc_partials_equal_batch_operator(spark, tmp_path_factory):
    """Streaming OHLC maintenance: out-of-order micro-batches (later
    files carry EARLIER days) append mergeable partials; the merged
    readout is BIT-equal to the batch bars — including open/close,
    which ride arg-min/max of the composed (ts, order) key."""
    import shutil

    from pytrousse_spark.io import read_parquet_df
    from pytrousse_spark.operators.timeseries import ohlc_bars
    from pytrousse_spark.streaming.events import (
        ohlc_events_stream,
        ohlc_from_partials,
    )

    d = tmp_path_factory.mktemp("ev_ohlc")
    batch = read_parquet_df(spark, f"{SF_DIR}/events.parquet")
    a = batch.where("day(ts) >= 15")
    b = batch.where("day(ts) < 15")
    a.write.mode("overwrite").parquet(str(d / "f1.parquet"))
    b.write.mode("overwrite").parquet(str(d / "f2.parquet"))
    src = tmp_path_factory.mktemp("ev_ohlc_src")
    for i, sub in enumerate(("f1.parquet", "f2.parquet")):
        for f in (d / sub).glob("*.parquet"):
            shutil.copy(f, src / f"batch{i}-{f.name}")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    store = str(tmp_path_factory.mktemp("ohlc_partials") / "store")
    ohlc_events_stream(stream, "event_type", "value", store)
    got = ohlc_from_partials(spark, store)
    want = ohlc_bars(batch, "event_type", "ts", "value", "event_id")
    norm = lambda df: sorted(
        tuple(r) for r in df.select(sorted(df.columns)).collect()
    )
    assert norm(got) == norm(want)
    nb = read_parquet_df(spark, store).select("__batch").distinct().count()
    assert nb >= 2


def test_stream_unicode_census_partials_bit_equal(spark, tmp_path_factory):
    """The streamed Unicode-census partials (foreachBatch appends of
    six mergeable BIGINT counters) merge to a readout BIT-EQUAL to the
    batch q254 census over the same corpus — out-of-order micro-batch
    split included (pure sums are order-free)."""
    import shutil

    from pytrousse_spark.io import read_parquet_df
    from pytrousse_spark.operators.quality import unicode_census
    from pytrousse_spark.streaming.events import (
        unicode_census_from_partials,
        unicode_census_stream,
    )

    batch = read_parquet_df(spark, f"{SF_DIR}/documents.parquet")
    d = tmp_path_factory.mktemp("docs_uc")
    a = batch.where("doc_id % 2 = 0")
    b = batch.where("doc_id % 2 = 1")
    a.write.mode("overwrite").parquet(str(d / "f1.parquet"))
    b.write.mode("overwrite").parquet(str(d / "f2.parquet"))
    src = tmp_path_factory.mktemp("docs_uc_src")
    # reversed copy order -> out-of-order arrival relative to doc_id
    for i, sub in enumerate(("f2.parquet", "f1.parquet")):
        for f in (d / sub).glob("*.parquet"):
            shutil.copy(f, src / f"batch{i}-{f.name}")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    store = str(tmp_path_factory.mktemp("uc_partials") / "store")
    unicode_census_stream(stream, "source", "text", store)
    got = unicode_census_from_partials(spark, store).collect()
    want = unicode_census(batch, "source", "text").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    nb = (
        read_parquet_df(spark, store)
        .select("__batch").distinct().count()
    )
    assert nb >= 2
