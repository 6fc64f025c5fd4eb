"""Streaming validation smoke: the same rule predicates over a streaming
source produce windowed violation counts equal to the batch computation
(memory sink + processAllAvailable drives the stream synchronously)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from fairy_core_spark.operators.rules import enum_pred, range_pred
from fairy_core_spark.streaming.validate import quarantine_split, streaming_rule_counts

SF = "/root/testdata/sf0.001"


def test_streaming_counts_match_batch(spark, tmp_path):
    batch = spark.read.parquet(f"{SF}/events.parquet")
    preds = {
        "enum_event_type": enum_pred(
            "event_type", ["click", "view", "purchase", "signup"], {}
        ),
        "range_value": range_pred("value", 0.0, 50.0, True),
    }

    src = tmp_path / "stream_src"
    src.mkdir()
    shutil.copy(f"{SF}/events.parquet", src / "events.parquet")
    stream = spark.readStream.schema(batch.schema).format("parquet").load(str(src))
    counts = streaming_rule_counts(stream, preds, ts_col="ts", window="1 day", watermark="0 seconds")
    q = (
        counts.writeStream.outputMode("append")
        .format("memory")
        .queryName("rule_counts")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    agg = {
        r["rule_id"]: int(r["v"])
        for r in spark.sql(
            "SELECT rule_id, SUM(violations) v FROM rule_counts GROUP BY rule_id"
        ).collect()
    }
    # append-mode watermark semantics: the final window stays open (no later
    # event advances the watermark past it), so compare against the batch
    # counts for events strictly before the last day window
    last_day = batch.agg(F.date_trunc("day", F.max("ts")).alias("d")).collect()[0]["d"]
    closed = batch.where(F.col("ts") < F.lit(last_day))
    want = {rid: closed.where(pred).count() for rid, pred in preds.items()}
    assert agg == want
    n_windows = spark.sql("SELECT COUNT(DISTINCT window) n FROM rule_counts").collect()[0]["n"]
    assert n_windows >= 2  # windowing actually materialized


def test_quarantine_split(spark, tmp_path):
    batch = spark.read.parquet(f"{SF}/events.parquet")
    preds = {"range_value": range_pred("value", 0.0, 50.0, True)}
    src = tmp_path / "stream_src"
    src.mkdir()
    shutil.copy(f"{SF}/events.parquet", src / "events.parquet")
    stream = spark.readStream.schema(batch.schema).format("parquet").load(str(src))
    clean, bad = quarantine_split(stream, preds)
    qb = (
        bad.writeStream.outputMode("append")
        .format("memory")
        .queryName("quarantined")
        .option("checkpointLocation", str(tmp_path / "ckpt_q"))
        .start()
    )
    qb.processAllAvailable()
    qb.stop()
    n_bad = spark.sql("SELECT COUNT(*) n FROM quarantined").collect()[0]["n"]
    assert n_bad == batch.where(preds["range_value"]).count()
    rules = spark.sql(
        "SELECT DISTINCT violated_rules FROM quarantined"
    ).collect()
    assert all(r["violated_rules"] == ["range_value"] for r in rules)


def test_stateful_sessionize_stream(spark, tmp_path):
    """applyInPandasWithState gap sessionization: every session (gap-split
    or idle) is emitted only once the watermark passes last_event + gap —
    within one processAllAvailable this happens via the no-data micro-batch
    Spark runs after the watermark advances."""
    import datetime as dt

    from fairy_core_spark.streaming.sessionize import sessionize_stream

    t0 = dt.datetime(2025, 1, 1, 0, 0, 0)

    def rows(*specs):
        return [(uid, t0 + dt.timedelta(seconds=s)) for uid, s in specs]

    schema = "user_id long, ts timestamp"
    src = tmp_path / "sess_src"
    src.mkdir()
    # batch 1: user 1 has two sessions split by a 2h in-batch gap;
    # user 2 has one idle session
    spark.createDataFrame(
        rows((1, 0), (1, 10), (1, 7200), (2, 0)), schema
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(schema).format("parquet").load(str(src))
    sessions = sessionize_stream(stream, gap_s=1800, watermark="30 minutes")
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt_s"))
        .start()
    )
    q.processAllAvailable()
    got1 = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    # post-batch watermark is 5400s: the deadlines of user 1's first
    # session (1810s) and user 2's idle session (1800s) have passed, so the
    # no-data micro-batch flushes both. user 1's second session (deadline
    # 9000s) stays pending.
    assert got1 == {
        (1, t0, t0 + dt.timedelta(seconds=10), 2),
        (2, t0, t0, 1),
    }

    # batch 2: a much later event advances the watermark past every open
    # session's deadline -> timeouts fire
    spark.createDataFrame(rows((3, 4 * 3600)), schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    q.processAllAvailable()
    q.stop()
    got2 = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    assert got2 == {
        (1, t0, t0 + dt.timedelta(seconds=10), 2),
        (1, t0 + dt.timedelta(seconds=7200), t0 + dt.timedelta(seconds=7200), 1),
        (2, t0, t0, 1),
    }


def test_stateful_sessionize_late_event_bridges_gap(spark, tmp_path):
    """An admissible late event that bridges an in-batch gap must MERGE the
    two fragments into one session — emission waits for the watermark to
    pass the gap deadline, so the early fragment is never emitted split."""
    import datetime as dt

    from fairy_core_spark.streaming.sessionize import sessionize_stream

    t0 = dt.datetime(2025, 1, 1)
    schema = "user_id long, ts timestamp"
    src = tmp_path / "late_src"
    src.mkdir()

    def write(*secs, uid=1):
        spark.createDataFrame(
            [(uid, t0 + dt.timedelta(seconds=s)) for s in secs], schema
        ).coalesce(1).write.mode("append").parquet(str(src))

    write(0, 2000)  # gap 2000 > 1800: looks like two sessions...
    stream = spark.readStream.schema(schema).format("parquet").load(str(src))
    q = (
        sessionize_stream(stream, gap_s=1800, watermark="30 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("late_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .start()
    )
    q.processAllAvailable()
    # watermark is only 200s: nothing may be emitted yet
    assert spark.sql("SELECT COUNT(*) n FROM late_sessions").collect()[0]["n"] == 0

    write(1000)  # late (>= watermark 200) event bridges the gap
    q.processAllAvailable()
    write(10000, uid=2)  # push the watermark past the merged deadline
    q.processAllAvailable()
    q.stop()
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM late_sessions").collect()
    }
    assert got == {(1, t0, t0 + dt.timedelta(seconds=2000), 3)}
