"""Streaming tile rollup parity: the watermark-closed streaming rollup over
a file source equals the identical batch aggregation on closed windows, and
the foreachBatch exact writer reproduces the batch exact dup counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from fairy_core_spark.spatial.ops import with_cell
from fairy_core_spark.streaming.tiles import (
    foreach_batch_tile_writer,
    streaming_tile_rollup,
)

N = 400
LEVEL = 7


def _source_df(spark):
    """Deterministic image-metadata stream rows: id, lat/lon on a coarse
    grid (so tiles repeat), w/h, phash with planted dups, hourly ts."""
    return (
        spark.range(0, N, 1, 8)
        .select(
            F.col("id"),
            (F.lit(40.0) + (F.col("id") % 5) * 0.5).alias("lat"),
            (F.lit(-74.0) + ((F.col("id") / 5).cast("long") % 5) * 0.5).alias("lon"),
            (F.lit(64) + (F.col("id") % 3)).cast("int").alias("w"),
            (F.lit(48) + (F.col("id") % 2)).cast("int").alias("h"),
            # 25% planted phash dups: ids sharing id%300 collide late in range
            (F.col("id") % 300).alias("phash"),
            F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 60).alias("ts"),
        )
    )


def test_streaming_rollup_matches_batch_on_closed_windows(spark, tmp_path):
    src = tmp_path / "src"
    batch = _source_df(spark)
    batch.write.parquet(str(src))

    stream = spark.readStream.schema(batch.schema).format("parquet").load(str(src))
    rollup = streaming_tile_rollup(
        stream, level=LEVEL, window="1 hour", watermark="0 seconds"
    )
    q = (
        rollup.writeStream.outputMode("append")
        .format("memory")
        .queryName("tile_rollup")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["ws"], r["tile_id"]): (r["n_images"], r["avg_w"], r["avg_h"], r["approx_phash_dups"])
        for r in spark.sql(
            "SELECT window.start AS ws, tile_id, n_images, avg_w, avg_h,"
            " approx_phash_dups FROM tile_rollup"
        ).collect()
    }
    assert got, "no closed windows emitted"

    # batch replay of the SAME aggregation (incl. the HLL estimate — the
    # sketch merge is deterministic, so streaming == batch exactly) over
    # windows strictly before the final (never-closed) one
    tiled = with_cell(batch, "lat", "lon", LEVEL, out="tile_id")
    win = F.window(F.col("ts"), "1 hour")
    n = F.count(F.lit(1))
    d = F.approx_count_distinct("phash", 0.05)
    exp_df = (
        tiled.groupBy(win.alias("window"), "tile_id")
        .agg(
            n.alias("n_images"),
            F.round(F.avg("w"), 4).alias("avg_w"),
            F.round(F.avg("h"), 4).alias("avg_h"),
            F.greatest(F.lit(0), n - d).alias("approx_phash_dups"),
        )
        .select(F.col("window.start").alias("ws"), "tile_id", "n_images", "avg_w", "avg_h", "approx_phash_dups")
    )
    last_ws = exp_df.agg(F.max("ws").alias("m")).collect()[0]["m"]
    exp = {
        (r["ws"], r["tile_id"]): (r["n_images"], r["avg_w"], r["avg_h"], r["approx_phash_dups"])
        for r in exp_df.where(F.col("ws") < F.lit(last_ws)).collect()
    }
    closed_got = {k: v for k, v in got.items() if k[0] < last_ws}
    assert closed_got == exp


def test_foreach_batch_exact_writer(spark, tmp_path):
    src = tmp_path / "src"
    batch = _source_df(spark)
    batch.write.parquet(str(src))
    out = tmp_path / "tiles_out"

    stream = spark.readStream.schema(batch.schema).format("parquet").load(str(src))
    writer = foreach_batch_tile_writer(str(out), level=LEVEL, window="1 hour")
    q = (
        stream.writeStream.foreachBatch(writer)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # availableNow over a static dir = one micro-batch -> per-batch exact
    # counts equal the batch exact two-level rollup over everything
    got = spark.read.parquet(str(out))
    merged = {
        (r["window_start"], r["tile_id"]): (r["n_images"], r["n_phash_dups"])
        for r in got.groupBy("window_start", "tile_id")
        .agg(F.sum("n_images").alias("n_images"), F.sum("n_phash_dups").alias("n_phash_dups"))
        .collect()
    }
    tiled = with_cell(batch, "lat", "lon", LEVEL, out="tile_id")
    exp = {
        (r["ws"], r["tile_id"]): (r["n"], r["dups"])
        for r in tiled.withColumn("ws", F.window("ts", "1 hour").getField("start"))
        .groupBy("ws", "tile_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.count(F.lit(1)) - F.countDistinct("phash")).alias("dups"),
        )
        .collect()
    }
    assert merged == exp
