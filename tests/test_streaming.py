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
    """applyInPandasWithState gap sessionization: in-batch gaps close
    sessions immediately; idle sessions close via event-time timeout once
    the watermark passes last_event + gap."""
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
    # the in-batch gap close emits immediately; user 2's idle session also
    # times out within processAllAvailable (the post-batch watermark 5400s
    # already passed its 1800s deadline and Spark runs a no-data micro-batch
    # to fire timeouts). user 1's second session (deadline 9000s) stays open.
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
