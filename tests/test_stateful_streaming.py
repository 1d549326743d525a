"""applyInPandasWithState operators: state must persist ACROSS
micro-batches (maxFilesPerTrigger=1 over two drops) and final results
must agree with the equivalent batch computation."""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from streamprocessing_kafka_finlight_news_dashboard_spark.sources.tables import load_table
from streamprocessing_kafka_finlight_news_dashboard_spark.streaming import pipeline as P
from streamprocessing_kafka_finlight_news_dashboard_spark.streaming import stateful as S
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def split_stream_dir(spark):
    """events split into two disjoint halves at the median timestamp →
    two genuine micro-batches arriving in event-time order (the shape
    a live feed delivers), no duplicates. A time-ordered split matters:
    the position tracker is an arrival-order state machine, so feeding
    batch 2 with timestamps BEFORE batch 1 would be replaying the past,
    not streaming."""
    d = tempfile.mkdtemp(prefix="stateful_events_")
    # write ts back as utc-naive micros (TIMESTAMP_NTZ) — the driver's
    # on-disk format the streaming source schema expects
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    ).withColumn("_us", F.expr("unix_micros(cast(ts AS timestamp))"))
    cutoff = ev.approxQuantile("_us", [0.5], 0.001)[0]
    ev.filter(F.col("_us") <= cutoff).drop("_us").coalesce(1).write.parquet(f"{d}/half0")
    ev.filter(F.col("_us") > cutoff).drop("_us").coalesce(1).write.parquet(f"{d}/half1")
    flat = tempfile.mkdtemp(prefix="stateful_flat_")
    i = 0
    for half in ("half0", "half1"):
        for f in os.listdir(f"{d}/{half}"):
            if f.endswith(".parquet"):
                shutil.copyfile(f"{d}/{half}/{f}", f"{flat}/drop{i}.parquet")
                i += 1
    shutil.rmtree(d, ignore_errors=True)
    yield flat
    shutil.rmtree(flat, ignore_errors=True)


def test_running_stats_accumulate_across_batches(spark, split_stream_dir):
    stream = P.read_event_file_stream(spark, split_stream_dir, max_files_per_trigger=1)
    out = S.running_user_stats(stream)
    P.run_available_to_memory(out, "stats_out", output_mode="append")
    got = spark.sql(
        """SELECT user_id, max(n_events) AS n_events, max(total_value) AS total_value,
                  max(max_value) AS max_value
           FROM stats_out GROUP BY user_id"""
    ).toPandas().set_index("user_id").sort_index()
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("value").alias("max_value"),
        )
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert (got["n_events"] == batch["n_events"]).all()
    assert (got["max_value"] == batch["max_value"]).all()
    pd.testing.assert_series_equal(
        got["total_value"], batch["total_value"], rtol=1e-9, check_exact=False
    )
    # state genuinely crossed batches: per-user counts after batch 2
    # exceed any single batch's contribution
    n_batches = spark.sql(
        "SELECT count(*) / count(DISTINCT user_id) AS rows_per_user FROM stats_out"
    ).first()[0]
    assert n_batches > 1, "expected one emission per user per micro-batch"


def test_position_tracker_state_machine(spark, split_stream_dir):
    stream = P.read_event_file_stream(spark, split_stream_dir, max_files_per_trigger=1)
    purchases = stream.filter(F.col("event_type") == "purchase")
    out = S.streaming_position_tracker(purchases)
    P.run_available_to_memory(out, "pos_out", output_mode="append")
    got = spark.sql("SELECT * FROM pos_out").toPandas()
    assert len(got) > 0
    assert set(got["action"]).issubset({"open", "close"})
    # invariant: per user, opens and closes alternate starting with open.
    # A stop/take exit and an immediate re-entry share one price row
    # (same ts); 'close' < 'open' lexicographically, so sorting on
    # (ts, action) reproduces the machine's close-then-reopen order.
    for uid, grp in got.sort_values(["ts", "action"]).groupby("user_id"):
        seq = list(grp["action"])
        for i, a in enumerate(seq):
            assert a == ("open" if i % 2 == 0 else "close"), (uid, seq)
    # every close pnl is consistent with stop-loss/take-profit exits
    closes = got[got["action"] == "close"]
    assert (closes["shares"] > 0).all()


def test_news_stream_enrichment(spark):
    """Sentiment-on-stream over a JSON news drop (the stubbed
    spark-ingestion job, completed)."""
    d = tempfile.mkdtemp(prefix="news_stream_")
    try:
        rows = [
            {"id": "a1", "title": "strong gain and bullish upgrade", "summary": "profit beats",
             "publish_date": "2024-01-01T10:00:00", "source": "wire",
             "created_at": "2024-01-01T10:01:00"},
            {"id": "a2", "title": "terrible loss after lawsuit", "summary": None,
             "publish_date": "2024-01-01T11:00:00", "source": "wire",
             "created_at": "2024-01-01T11:01:00"},
        ]
        pd.DataFrame(rows).to_json(f"{d}/drop1.json", orient="records", lines=True)
        stream = (
            spark.readStream.schema(P.NEWS_STREAM_SCHEMA).json(d)
        )
        enriched = S.enrich_news_stream(stream)
        P.run_available_to_memory(enriched, "news_out")
        got = spark.sql("SELECT id, sentiment FROM news_out").toPandas().set_index("id")
        assert got.loc["a1", "sentiment"] > 0 > got.loc["a2", "sentiment"]
    finally:
        shutil.rmtree(d, ignore_errors=True)


class _FakeTimedOutState:
    """Stand-in GroupState for the timeout invocation: no buffered
    rows, hasTimedOut=True. Lets the idle-key GC branch be tested
    without a continuous processingTime deployment (availableNow
    drains never fire timers — see .claude/skills/verify gotchas)."""

    hasTimedOut = True
    exists = True

    def __init__(self):
        self.removed = False
        self.get = (1, 2.0, 3.0, 4)

    def remove(self):
        self.removed = True

    def update(self, v):  # pragma: no cover - must not be called
        raise AssertionError("timeout branch must not update state")

    def setTimeoutDuration(self, ms):  # pragma: no cover - must not be called
        raise AssertionError("timeout branch must not re-register the timer")


def test_stats_fn_timeout_evicts_state_and_emits_nothing():
    fn = S._make_stats_fn(idle_timeout_ms=60_000)
    state = _FakeTimedOutState()
    frames = list(fn((7,), iter([]), state))
    assert frames == []
    assert state.removed


def test_position_fn_timeout_evicts_state_and_emits_nothing():
    fn = S._make_position_fn(idle_timeout_ms=60_000)
    state = _FakeTimedOutState()
    state.get = (10.0, 5.0, True)
    frames = list(fn((7,), iter([]), state))
    assert frames == []
    assert state.removed
