"""Streaming geofence dwell episodes: batch parity on closed episodes,
frozen-timeline correctness under out-of-order (admissible) arrivals,
NULL-region breakers, and the pending-final-episode contract."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from fairy_core_spark.streaming.geofence import streaming_dwell_episodes

T0 = dt.datetime(2025, 1, 1, 0, 0, 0)
SCHEMA = "entity_id long, ts timestamp, region string"


def _rows(*specs):
    return [(eid, T0 + dt.timedelta(seconds=s), r) for eid, s, r in specs]


def _collect(spark, name):
    return {
        (r["entity_id"], r["episode_seq"], r["region"], r["enter_ts"],
         r["exit_ts"], r["n_points"], r["dwell_us"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


def test_streaming_dwell_matches_batch_closed_episodes(spark, tmp_path):
    """Every episode with a frozen successor is emitted with the batch
    operator's exact fields (incl. seq and integer-us dwell); each
    entity's final open episode stays pending by design. NULL region
    closes a run without forming one."""
    from fairy_core_spark.spatial.trajectory import dwell_episodes

    data = _rows(
        (1, 0, "A"), (1, 60, "A"), (1, 120, "A"),
        (1, 300, "B"), (1, 360, "B"),
        (1, 600, "A"),
        (2, 0, "A"), (2, 100, None), (2, 200, "C"),
    )
    src = tmp_path / "geo_src"
    src.mkdir()
    spark.createDataFrame(data, SCHEMA).coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(SCHEMA).format("parquet").load(str(src))
    out = streaming_dwell_episodes(stream, watermark="0 seconds")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("geo_eps")
        .option("checkpointLocation", str(tmp_path / "ckpt_geo"))
        .start()
    )
    q.processAllAvailable()
    got = _collect(spark, "geo_eps")

    # batch twin over the same rows; streaming must match every episode
    # except each entity's LAST (open — no frozen successor yet)
    batch = dwell_episodes(
        spark.createDataFrame(data, SCHEMA), entity_col="entity_id"
    )
    w_last = F.max("episode_seq").over(
        __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy("entity_id")
    )
    exp = {
        tuple(r)
        for r in batch.withColumn("__last", w_last)
        .where(F.col("episode_seq") < F.col("__last"))
        .select("entity_id", "episode_seq", "region", "enter_ts",
                "exit_ts", "n_points", "dwell_us")
        .collect()
    }
    assert got == exp
    # the A[0..120] episode carries exact integer-us dwell
    assert (1, 1, "A", T0, T0 + dt.timedelta(seconds=120), 3, 120_000_000) in got

    # a much later event freezes the pending runs' events but cannot close
    # them (no successor) — emissions must NOT change
    spark.createDataFrame(_rows((3, 7200, "Z")), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    q.processAllAvailable()
    q.stop()
    assert _collect(spark, "geo_eps") == got


def test_streaming_dwell_out_of_order_admissible_event(spark, tmp_path):
    """An admissible out-of-order event (inside the lateness horizon) must
    be folded into its event-time position: B lands BETWEEN two already-
    seen A events and splits them exactly as the batch operator would."""
    src = tmp_path / "geo_ooo"
    src.mkdir()
    spark.createDataFrame(
        _rows((1, 0, "A"), (1, 7200, "A")), SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(SCHEMA).format("parquet").load(str(src))
    out = streaming_dwell_episodes(stream, watermark="1 hour")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("geo_ooo")
        .option("checkpointLocation", str(tmp_path / "ckpt_ooo"))
        .start()
    )
    q.processAllAvailable()

    # batch 2: B@5000s — older than the seen A@7200s but >= the watermark
    # (3600s), so it is admissible and must slot between the A events
    spark.createDataFrame(_rows((1, 5000, "B")), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    q.processAllAvailable()

    # batch 3: advance the watermark past everything pending's closers
    spark.createDataFrame(_rows((1, 20000, "A")), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    q.processAllAvailable()
    q.stop()

    got = _collect(spark, "geo_ooo")
    assert got == {
        (1, 1, "A", T0, T0, 1, 0),
        (1, 2, "B", T0 + dt.timedelta(seconds=5000),
         T0 + dt.timedelta(seconds=5000), 1, 0),
    }
