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
