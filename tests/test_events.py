"""Event operators: batch sessionization golden + the custom stateful
streaming operator (applyInPandasWithState) against its batch oracle."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_sessionize_hand_case(spark):
    from perl_html5_dom_spark.operators.events import sessionize

    rows = [
        # user 1: two sessions (gap of 31 min between event 2 and 3)
        (0, "2024-01-01 10:00:00", 1, 1.0),
        (1, "2024-01-01 10:10:00", 1, 2.0),
        (2, "2024-01-01 10:41:00", 1, 4.0),
        # user 2: one session
        (3, "2024-01-01 09:00:00", 2, 8.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, value double"
    ).selectExpr("event_id", "cast(ts as timestamp_ntz) as ts",
                 "user_id", "value")
    got = {(r.user_id, r.session_idx): (r.n_events, r.total_value)
           for r in sessionize(df).collect()}
    assert got == {(1, 0): (2, 3.0), (1, 1): (1, 4.0), (2, 0): (1, 8.0)}


def test_windowed_counts_totals(spark, events):
    from perl_html5_dom_spark.operators.events import windowed_counts

    out = windowed_counts(events)
    assert out.agg(F.sum("n")).first()[0] == events.count()
    # every window start is hour-aligned
    assert out.filter(F.col("window_start_us") % 3_600_000_000 != 0).count() == 0


def test_sessionize_stream_matches_batch(spark, events, tmp_path):
    """The stateful streaming sessionizer must emit exactly the CLOSED
    sessions of the batch sessionization (every session except each
    user's final one), with identical stats, when events arrive in
    event-time order across micro-batches."""
    from perl_html5_dom_spark.operators.events import (
        sessionize, sessionize_stream)

    src = str(tmp_path / "stream_in")
    ordered = events.orderBy("ts", "event_id").collect()
    n = len(ordered)
    # three time-ordered files -> three micro-batches in arrival order
    for i, chunk in enumerate((ordered[:n // 3], ordered[n // 3:2 * n // 3],
                               ordered[2 * n // 3:])):
        spark.createDataFrame(chunk, events.schema).coalesce(1).write.mode(
            "append").parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory").queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.session_idx):
            (r.n_events, r.t_start_us, r.t_end_us, round(r.total_value, 4))
        for r in spark.table("sessions_out").collect()
    }

    batch = sessionize(events)
    last = batch.groupBy("user_id").agg(
        F.max("session_idx").alias("session_idx"))
    closed = batch.join(last, ["user_id", "session_idx"], "left_anti")
    want = {
        (r.user_id, r.session_idx):
            (r.n_events, r.t_start_us, r.t_end_us, round(r.total_value, 4))
        for r in closed.collect()
    }
    assert got == want
    assert len(got) > 50  # the corpus actually exercises multi-session users
