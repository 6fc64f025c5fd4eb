"""Streaming flow hops: batch parity of the aggregated (tile, sector)
histogram, exactly-once emission across watermark-advancing batches, and
out-of-order (admissible) arrival correctness."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from fairy_core_spark.streaming.flow import streaming_flow_sectors, streaming_hops

T0 = dt.datetime(2025, 1, 1, 0, 0, 0)
SCHEMA = "user_id long, ts timestamp, lat double, lon double"


def _rows(*specs):
    return [
        (u, T0 + dt.timedelta(seconds=s), lat, lon) for u, s, lat, lon in specs
    ]


def _agg_memory(spark, name):
    return {
        (r.x, r.y, r.sector): (r.n, r.sx, r.sy)
        for r in spark.sql(
            f"SELECT x, y, sector, COUNT(*) AS n, SUM(dx) AS sx, SUM(dy) AS sy "
            f"FROM {name} GROUP BY 1, 2, 3"
        ).collect()
    }


def _batch_agg(spark, data, zoom):
    from fairy_core_spark.spatial.trajectory import flow_sector_rollup

    return {
        (r.x, r.y, r.sector): (r.n_moves, r.dx_sum, r.dy_sum)
        for r in flow_sector_rollup(
            spark.createDataFrame(data, SCHEMA), zoom
        ).collect()
    }


def test_streaming_matches_batch_rollup(spark, tmp_path):
    data = _rows(
        (1, 0, 10.000, 10.000),
        (1, 60, 10.000, 10.050),   # E
        (1, 120, 10.050, 10.050),  # N
        (1, 180, 10.050, 10.050),  # zero hop: dropped
        (1, 240, 10.000, 10.000),  # SW
        (2, 0, -20.000, 30.000),
        (2, 60, -20.040, 30.000),  # S
    )
    src = tmp_path / "flow_src"
    src.mkdir()
    spark.createDataFrame(data, SCHEMA).coalesce(1).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(SCHEMA).format("parquet").load(str(src))
    out = streaming_flow_sectors(stream, zoom=6, watermark="0 seconds")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("flow_mem")
        .option("checkpointLocation", str(tmp_path / "ckpt_flow"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = _agg_memory(spark, "flow_mem")
    assert got == _batch_agg(spark, data, 6) and got


def test_cross_batch_pairs_emit_exactly_once(spark, tmp_path):
    """The hop whose start is batch 1's last frozen event emits when its
    successor (batch 2) freezes — once, with the correct start point."""
    b1 = _rows((7, 0, 0.000, 0.000), (7, 60, 0.000, 0.010))
    b2 = _rows((7, 120, 0.010, 0.010), (7, 180, 0.010, 0.020))
    src = tmp_path / "flow_src2"
    src.mkdir()
    stream = spark.readStream.schema(SCHEMA).format("parquet").load(str(src))
    out = streaming_hops(stream, watermark="0 seconds")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("flow_mem2")
        .option("checkpointLocation", str(tmp_path / "ckpt_flow2"))
        .start()
    )
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.mode("append").parquet(str(src))
    q.processAllAvailable()
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode("append").parquet(str(src))
    q.processAllAvailable()
    q.stop()
    got = sorted(
        (r.user_id, r.ts, r.dx, r.dy)
        for r in spark.sql("SELECT * FROM flow_mem2").collect()
    )
    assert got == [
        (7, T0, 10, 0),
        (7, T0 + dt.timedelta(seconds=60), 0, 10),
        (7, T0 + dt.timedelta(seconds=120), 10, 0),
    ]


def test_out_of_order_admissible_arrivals(spark, tmp_path):
    """A late-but-admissible event (ts above the previous watermark) slots
    into its correct position; the final hop sequence matches batch."""
    b1 = _rows((3, 0, 5.000, 5.000), (3, 300, 5.000, 5.030))
    b2 = _rows((3, 200, 5.020, 5.000))  # arrives late, slots in between
    src = tmp_path / "flow_src3"
    src.mkdir()
    stream = spark.readStream.schema(SCHEMA).format("parquet").load(str(src))
    out = streaming_hops(stream, watermark="10 minutes")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("flow_mem3")
        .option("checkpointLocation", str(tmp_path / "ckpt_flow3"))
        .start()
    )
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.mode("append").parquet(str(src))
    q.processAllAvailable()
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode("append").parquet(str(src))
    q.processAllAvailable()
    # push the watermark past every earlier event so their hops freeze
    # (b3's own trailing hop needs b4 to freeze b3's event; b4's zero
    # displacement vs b3 is dropped, so output ends at the b3 closer)
    b3 = _rows((3, 30000, 5.000, 5.000))
    spark.createDataFrame(b3, SCHEMA).coalesce(1).write.mode("append").parquet(str(src))
    q.processAllAvailable()
    b4 = _rows((3, 31000, 5.000, 5.000))
    spark.createDataFrame(b4, SCHEMA).coalesce(1).write.mode("append").parquet(str(src))
    q.processAllAvailable()
    q.processAllAvailable()
    q.stop()
    got = sorted(
        (r.ts, r.dx, r.dy) for r in spark.sql("SELECT * FROM flow_mem3").collect()
    )
    assert got == [
        (T0, 0, 20),                               # (5.000,5.000)->(5.020,5.000)
        (T0 + dt.timedelta(seconds=200), 30, -20),  # ->(5.000,5.030)
        (T0 + dt.timedelta(seconds=300), -30, 0),   # ->(5.000,5.000) closer
    ]
