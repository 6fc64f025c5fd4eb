"""Watermarked stream-stream join: parity with the batch join inside the
delay horizon, out-of-horizon pairs dropped, and composition with the
stateless tile encode downstream."""

from __future__ import annotations

from pyspark.sql import functions as F

from fairy_core_spark.streaming.joins import streaming_image_geo_join

BASE = 1700000000


def _write_sources(spark, tmp_path):
    imgs = spark.range(0, 200).select(
        F.concat(F.lit("img"), F.col("id")).alias("image_id"),
        (F.col("id") % 3).cast("int").alias("w"),
        F.timestamp_seconds(F.lit(BASE) + F.col("id") * 60).alias("ts"),
    )
    # geo arrives 5 min late for most rows; every 10th arrives 30 min late
    # (outside the 15-minute horizon -> must NOT join)
    delay = F.when(F.col("id") % 10 == 0, 1800).otherwise(300)
    geo = spark.range(0, 200).select(
        F.concat(F.lit("img"), F.col("id")).alias("image_id"),
        (F.lit(40.0) + (F.col("id") % 5) * 0.5).alias("lat"),
        (F.lit(-74.0) + (F.col("id") % 7) * 0.5).alias("lon"),
        F.timestamp_seconds(F.lit(BASE) + F.col("id") * 60 + delay).alias("ts"),
    )
    ipath, gpath = tmp_path / "imgs", tmp_path / "geo"
    imgs.write.parquet(str(ipath))
    geo.write.parquet(str(gpath))
    return imgs, geo, ipath, gpath


def test_stream_stream_join_matches_batch_within_horizon(spark, tmp_path):
    imgs, geo, ipath, gpath = _write_sources(spark, tmp_path)

    si = spark.readStream.schema(imgs.schema).parquet(str(ipath))
    sg = spark.readStream.schema(geo.schema).parquet(str(gpath))
    joined = streaming_image_geo_join(si, sg, watermark="0 seconds", max_delay="15 minutes")

    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["image_id"], r["lat"], r["lon"])
        for r in spark.sql("SELECT image_id, lat, lon FROM ss_join").collect()
    }

    # batch reference: equi-join + the same symmetric 15-minute bound
    exp_df = imgs.alias("i").join(
        geo.alias("g"),
        (F.col("i.image_id") == F.col("g.image_id"))
        & (F.col("g.ts") >= F.col("i.ts") - F.expr("INTERVAL 15 minutes"))
        & (F.col("g.ts") <= F.col("i.ts") + F.expr("INTERVAL 15 minutes")),
    )
    exp = {
        (r["image_id"], r["lat"], r["lon"])
        for r in exp_df.select("i.image_id", "lat", "lon").collect()
    }
    assert got == exp
    # the 30-min-late geo rows (id % 10 == 0) are excluded by the horizon
    assert len(exp) == 180 and all(
        int(i[0][3:]) % 10 != 0 for i in got
    )


def test_joined_stream_composes_with_tile_encode(spark, tmp_path):
    """stateless encode downstream of the stream-stream join — the live
    north-input assembly feeding the tiling stage."""
    from fairy_core_spark.spatial.ops import with_cell

    imgs, geo, ipath, gpath = _write_sources(spark, tmp_path)
    si = spark.readStream.schema(imgs.schema).parquet(str(ipath))
    sg = spark.readStream.schema(geo.schema).parquet(str(gpath))
    joined = streaming_image_geo_join(si, sg, watermark="0 seconds", max_delay="15 minutes")
    tiled = with_cell(joined, "lat", "lon", 7, out="tile_id")

    q = (
        tiled.select("image_id", "tile_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_tiles")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT COUNT(*) AS n, COUNT(DISTINCT tile_id) AS t FROM ss_tiles").collect()[0]
    assert rows["n"] == 180 and rows["t"] > 1


def test_left_outer_emits_unmatched_after_horizon(spark, tmp_path):
    """leftOuter: an image whose geo fix never arrives emits with nulls —
    but only after the watermark passes its match horizon (advanced here by
    a later second batch, the standard two-batch pattern)."""
    import time

    from pyspark.sql import functions as F

    from fairy_core_spark.streaming.joins import streaming_keyed_join

    ipath, gpath = tmp_path / "imgs2", tmp_path / "geo2"
    imgs1 = spark.createDataFrame(
        [("a", "x"), ("b", "x")], "image_id string, payload string"
    ).select(
        "image_id", "payload", F.timestamp_seconds(F.lit(BASE)).alias("ts")
    )
    geo1 = spark.createDataFrame([("a",)], "image_id string").select(
        "image_id",
        F.lit(1.0).alias("lat"),
        F.lit(2.0).alias("lon"),
        F.timestamp_seconds(F.lit(BASE + 60)).alias("ts"),
    )
    imgs1.write.parquet(str(ipath))
    geo1.write.parquet(str(gpath))

    si = spark.readStream.schema(imgs1.schema).parquet(str(ipath))
    sg = spark.readStream.schema(geo1.schema).parquet(str(gpath))
    joined = streaming_keyed_join(
        si, sg, "image_id", watermark="0 seconds",
        max_delay="15 minutes", how="leftOuter",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_outer")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    q.processAllAvailable()
    first = {r["image_id"]: r["lat"] for r in spark.sql("SELECT * FROM ss_outer").collect()}
    assert first.get("a") == 1.0  # matched pair emits immediately
    # 'b' may not emit yet: its horizon (BASE + 15 min) is not past the watermark

    # second batch far in the future advances the watermark past b's horizon
    spark.createDataFrame([("z", "x")], "image_id string, payload string").select(
        "image_id", "payload", F.timestamp_seconds(F.lit(BASE + 7200)).alias("ts")
    ).write.mode("append").parquet(str(ipath))
    spark.createDataFrame([("z2",)], "image_id string").select(
        "image_id", F.lit(0.0).alias("lat"), F.lit(0.0).alias("lon"),
        F.timestamp_seconds(F.lit(BASE + 7200)).alias("ts"),
    ).write.mode("append").parquet(str(gpath))
    q.processAllAvailable()
    # one more empty-ish trigger lets the state-eviction batch run
    time.sleep(0.2)
    q.processAllAvailable()
    q.stop()

    rows = {r["image_id"]: (r["lat"], r["lon"]) for r in spark.sql("SELECT * FROM ss_outer").collect()}
    assert rows["a"] == (1.0, 2.0)
    assert "b" in rows and rows["b"] == (None, None)  # unmatched left emitted with nulls
