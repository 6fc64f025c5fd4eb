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


def _write_rows(spark, path, rows):
    spark.createDataFrame(
        rows, "id long, lat double, lon double, w int, h int, phash long, ts timestamp"
    ).coalesce(1).write.mode("append").parquet(str(path))


def _mk_row(i, hour, phash):
    import datetime

    ts = datetime.datetime(2023, 11, 14, hour, i % 60, 0)
    return (i, 40.0 + (i % 5) * 0.5, -74.0 + (i % 3) * 0.5, 64, 48, phash, ts)


def test_tile_rollup_restart_recovers_window_state(spark, tmp_path):
    """Kill/resume semantics of the streaming rollup: stop after phase A
    (availableNow drains, query stops — same recovery path as a crash,
    the checkpoint holds the un-closed windows' aggregation state), then
    restart from the SAME checkpointLocation over new files. Windows that
    straddle the restart must close with counts from BOTH phases (state
    was recovered, no loss), and no (window, tile) row may appear twice
    (closed windows are not re-emitted — no dup)."""
    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    # phase A: hours 0 and 1; watermark 0s -> only hour 0 closes in phase A
    a_rows = [_mk_row(i, 0, 100 + i) for i in range(10)] + [
        _mk_row(100 + i, 1, 200 + i) for i in range(7)
    ]
    _write_rows(spark, src, a_rows)
    schema = spark.read.parquet(str(src)).schema

    def run_once():
        stream = spark.readStream.schema(schema).format("parquet").load(str(src))
        rollup = streaming_tile_rollup(stream, level=LEVEL, window="1 hour", watermark="0 seconds")
        q = (
            rollup.selectExpr("window.start AS ws", "tile_id", "n_images")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()  # phase A, then the query stops (restartable checkpoint)

    # phase B: MORE hour-1 rows (same open window — counted only if state
    # recovered) plus hour 2/3 rows that advance the watermark past hour 1
    b_rows = [_mk_row(200 + i, 1, 300 + i) for i in range(5)] + [
        _mk_row(300 + i, 2, 400 + i) for i in range(4)
    ] + [_mk_row(400 + i, 3, 500 + i) for i in range(3)]
    _write_rows(spark, src, b_rows)
    run_once()  # restart from the same checkpoint

    got = spark.read.parquet(str(out)).collect()
    seen = [(r["ws"], r["tile_id"]) for r in got]
    assert len(seen) == len(set(seen)), "a closed (window, tile) was emitted twice"

    # batch replay over everything; closed windows = hours 0..2
    batch = spark.read.parquet(str(src))
    tiled = with_cell(batch, "lat", "lon", LEVEL, out="tile_id")
    exp = {
        (r["ws"], r["tile_id"]): r["n"]
        for r in tiled.withColumn("ws", F.window("ts", "1 hour").getField("start"))
        .groupBy("ws", "tile_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r["ws"].hour < 3
    }
    got_map = {(r["ws"], r["tile_id"]): r["n_images"] for r in got}
    assert got_map == exp, "restarted rollup lost or duplicated rows"
    # the straddling hour-1 windows specifically must mix A and B counts
    assert sum(v for (ws, _t), v in got_map.items() if ws.hour == 1) == 12


def test_streaming_dedup_restart_suppresses_cross_restart_dups(spark, tmp_path):
    """Exact-dedup state survives a stop/restart: keys first seen in phase
    A and re-arriving in phase B (after the restart) are suppressed by the
    RECOVERED state store; new keys pass. The landed table holds every key
    exactly once — no dup, no loss."""
    from fairy_core_spark.streaming.dedup import streaming_dedup_keys

    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    a_rows = [_mk_row(k, 0, k) for k in range(10)] + [_mk_row(k, 0, k) for k in range(10)]
    _write_rows(spark, src, a_rows)
    schema = spark.read.parquet(str(src)).schema

    def run_once():
        stream = spark.readStream.schema(schema).format("parquet").load(str(src))
        deduped = streaming_dedup_keys(stream, ["phash"], ts_col="ts", watermark="6 hours")
        q = (
            deduped.writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # phase B: keys 5..9 are cross-restart duplicates, 10..14 are new
    _write_rows(spark, src, [_mk_row(100 + k, 1, k) for k in range(5, 15)])
    run_once()

    keys = sorted(r["phash"] for r in spark.read.parquet(str(out)).collect())
    assert keys == list(range(15)), f"expected each key exactly once, got {keys}"


def test_foreach_batch_writer_replay_is_idempotent(spark, tmp_path):
    """Crash-replay semantics of the exact writer: foreachBatch may
    re-deliver a batch_id after a failure before the commit; the dynamic
    overwrite of that batch's own partition must make the replay a no-op."""
    out = tmp_path / "tiles_out"
    batch = _source_df(spark)
    writer = foreach_batch_tile_writer(str(out), level=LEVEL, window="1 hour")
    writer(batch, 7)
    once = sorted(map(tuple, spark.read.parquet(str(out)).collect()))
    writer(batch, 7)  # replay of the same micro-batch
    twice = sorted(map(tuple, spark.read.parquet(str(out)).collect()))
    assert once == twice


def test_streaming_rollup_hex7_scheme_matches_batch(spark, tmp_path):
    """cell_scheme='hex7' flows through the streaming rollup: same windows
    and totals as the batch aggregation over hexagonal tiles."""
    src = tmp_path / "src_hex"
    batch = _source_df(spark)
    batch.write.parquet(str(src))

    stream = spark.readStream.schema(batch.schema).format("parquet").load(str(src))
    rollup = streaming_tile_rollup(
        stream, level=5, window="1 hour", watermark="0 seconds", cell_scheme="hex7"
    )
    q = (
        rollup.writeStream.outputMode("append")
        .format("memory")
        .queryName("tile_rollup_hex")
        .option("checkpointLocation", str(tmp_path / "ckpt_hex"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["ws"], r["tile_id"]): r["n_images"]
        for r in spark.sql(
            "SELECT window.start AS ws, tile_id, n_images FROM tile_rollup_hex"
        ).collect()
    }
    assert got, "no closed windows emitted"
    # batch replay over windows strictly before the final (never-closed) one
    exp_df = (
        with_cell(batch, "lat", "lon", 5, out="tile_id", scheme="hex7")
        .groupBy(F.window(F.col("ts"), "1 hour").alias("window"), "tile_id")
        .agg(F.count(F.lit(1)).alias("n_images"))
        .select(F.col("window.start").alias("ws"), "tile_id", "n_images")
    )
    last_ws = exp_df.agg(F.max("ws").alias("m")).collect()[0]["m"]
    exp = {
        (r["ws"], r["tile_id"]): r["n_images"]
        for r in exp_df.where(F.col("ws") < F.lit(last_ws)).collect()
    }
    assert {k: v for k, v in got.items() if k[0] < last_ws} == exp
    # hex ids carry the hex7 res field
    assert {(int(t) >> 59) & 0xF for _, t in got} == {5}


def test_streaming_rollup_webmercator_scheme_matches_batch(spark, tmp_path):
    """cell_scheme='webmercator' flows through the streaming ROLLUP (the
    pyramid twin was covered; the rollup branch wasn't): same windows
    and totals as the batch quadkey aggregation."""
    from fairy_core_spark.spatial.webmercator import with_tiles

    src = tmp_path / "src_wm_roll"
    batch = _source_df(spark)
    batch.write.parquet(str(src))

    stream = spark.readStream.schema(batch.schema).format("parquet").load(str(src))
    rollup = streaming_tile_rollup(
        stream, level=5, window="1 hour", watermark="0 seconds",
        cell_scheme="webmercator",
    )
    q = (
        rollup.writeStream.outputMode("append")
        .format("memory")
        .queryName("tile_rollup_wm")
        .option("checkpointLocation", str(tmp_path / "ckpt_wm_roll"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["ws"], r["tile_id"]): r["n_images"]
        for r in spark.sql(
            "SELECT window.start AS ws, tile_id, n_images FROM tile_rollup_wm"
        ).collect()
    }
    assert got, "no closed windows emitted"
    exp_df = (
        with_tiles(batch, zoom=5, quadkey=True)
        .withColumnRenamed("quadkey", "tile_id")
        .groupBy(F.window(F.col("ts"), "1 hour").alias("window"), "tile_id")
        .agg(F.count(F.lit(1)).alias("n_images"))
        .select(F.col("window.start").alias("ws"), "tile_id", "n_images")
    )
    last_ws = exp_df.agg(F.max("ws").alias("m")).collect()[0]["m"]
    exp = {
        (r["ws"], r["tile_id"]): r["n_images"]
        for r in exp_df.where(F.col("ws") < F.lit(last_ws)).collect()
    }
    assert {k: v for k, v in got.items() if k[0] < last_ws} == exp
    # quadkeys at zoom 5: base-4 strings of length 5
    assert all(len(t) == 5 and set(t) <= set("0123") for _, t in got)


def test_streaming_pyramid_matches_batch_on_closed_windows(spark, tmp_path):
    """streaming_tile_pyramid == the batch pyramid aggregation on closed
    windows, for both schemes (the level explode is stateless, so watermark
    semantics are untouched)."""
    from fairy_core_spark.spatial.hex7_ops import hex7_pyramid
    from fairy_core_spark.spatial.ops import s2_pyramid
    from fairy_core_spark.streaming.tiles import streaming_tile_pyramid

    src = tmp_path / "pyr_src"
    batch = _source_df(spark)
    batch.write.parquet(str(src))

    for scheme, lvls, pyr in (("s2", (7, 4), s2_pyramid), ("hex7", (4, 2), hex7_pyramid)):
        stream = spark.readStream.schema(batch.schema).format("parquet").load(str(src))
        q = (
            streaming_tile_pyramid(
                stream, levels=lvls, window="1 hour",
                watermark="0 seconds", cell_scheme=scheme,
            )
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(f"pyr_{scheme}")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{scheme}"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = {
            (r["ws"], r["res"], r["cell"]): (r["n_images"], r["avg_w"], r["avg_h"])
            for r in spark.sql(
                f"SELECT window.start AS ws, res, cell, n_images, avg_w, avg_h FROM pyr_{scheme}"
            ).collect()
        }
        assert got, f"no closed windows emitted ({scheme})"

        tiled = with_cell(batch, "lat", "lon", max(lvls), out="__cell", scheme=scheme)
        exp_df = (
            pyr(tiled, cell_col="__cell", levels=lvls)
            .groupBy(F.window(F.col("ts"), "1 hour").alias("window"), "res", "cell")
            .agg(
                F.count(F.lit(1)).alias("n_images"),
                F.round(F.avg("w"), 4).alias("avg_w"),
                F.round(F.avg("h"), 4).alias("avg_h"),
            )
            .select(F.col("window.start").alias("ws"), "res", "cell", "n_images", "avg_w", "avg_h")
        )
        last_ws = exp_df.agg(F.max("ws").alias("m")).collect()[0]["m"]
        exp = {
            (r["ws"], r["res"], r["cell"]): (r["n_images"], r["avg_w"], r["avg_h"])
            for r in exp_df.where(F.col("ws") < F.lit(last_ws)).collect()
        }
        closed_got = {k: v for k, v in got.items() if k[0] < last_ws}
        assert closed_got == exp


def test_streaming_pyramid_webmercator_matches_batch(spark, tmp_path):
    """streaming_tile_pyramid(cell_scheme='webmercator') == the batch
    quadkey pyramid on closed windows; the streaming plan is fully
    Python-free (no ArrowEvalPython / BatchEvalPython nodes)."""
    from fairy_core_spark.spatial.webmercator import pyramid, with_tiles
    from fairy_core_spark.streaming.tiles import streaming_tile_pyramid

    src = tmp_path / "pyr_wm_src"
    batch = _source_df(spark)
    batch.write.parquet(str(src))
    lvls = (8, 5)

    stream = spark.readStream.schema(batch.schema).format("parquet").load(str(src))
    out = streaming_tile_pyramid(
        stream, levels=lvls, window="1 hour",
        watermark="0 seconds", cell_scheme="webmercator",
    )
    # Non-vacuous no-Python check: EvalPython nodes only materialize in
    # the PHYSICAL plan (an analyzed plan prints a pandas_udf as
    # "name(...)" — no "Python" substring — so asserting on analyzed()
    # can never fail). Drive the same _encode_cell dispatch in batch and
    # inspect executedPlan; the s2 twin is the positive control proving
    # the detector actually fires on an Arrow udf.
    from fairy_core_spark.streaming.tiles import _encode_cell

    wm_phys = (
        _encode_cell(batch, "lat", "lon", 8, "cell", "webmercator")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in wm_phys
    s2_phys = (
        _encode_cell(batch, "lat", "lon", 8, "cell", "s2")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" in s2_phys  # detector sanity: Arrow path shows up
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("pyr_wm")
        .option("checkpointLocation", str(tmp_path / "ckpt_wm"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["ws"], r["res"], r["cell"]): (r["n_images"], r["avg_w"], r["avg_h"])
        for r in spark.sql(
            "SELECT window.start AS ws, res, cell, n_images, avg_w, avg_h FROM pyr_wm"
        ).collect()
    }
    assert got, "no closed windows emitted (webmercator)"

    tiled = with_tiles(batch, zoom=max(lvls), prefix="__t").withColumnRenamed(
        "quadkey", "__cell"
    ).drop("__tx", "__ty")
    exp_df = (
        pyramid(tiled, quadkey_col="__cell", zooms=lvls)
        .groupBy(F.window(F.col("ts"), "1 hour").alias("window"), "res", "cell")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.round(F.avg("w"), 4).alias("avg_w"),
            F.round(F.avg("h"), 4).alias("avg_h"),
        )
        .select(F.col("window.start").alias("ws"), "res", "cell", "n_images", "avg_w", "avg_h")
    )
    last_ws = exp_df.agg(F.max("ws").alias("m")).collect()[0]["m"]
    exp = {
        (r["ws"], r["res"], r["cell"]): (r["n_images"], r["avg_w"], r["avg_h"])
        for r in exp_df.where(F.col("ws") < F.lit(last_ws)).collect()
    }
    closed_got = {k: v for k, v in got.items() if k[0] < last_ws}
    assert closed_got == exp


def test_streaming_heatmap_matches_batch_on_closed_windows(spark, tmp_path):
    """streaming_heatmap == batch smoothed_tile_density per closed window
    (the per-point scatter commutes with the windowed count), and the
    streaming plan is Python-free."""
    from fairy_core_spark.spatial.ops import smoothed_tile_density
    from fairy_core_spark.spatial.webmercator import with_tiles
    from fairy_core_spark.streaming.tiles import streaming_heatmap

    src = tmp_path / "heat_src"
    batch = _source_df(spark)
    batch.write.parquet(str(src))

    stream = spark.readStream.schema(batch.schema).format("parquet").load(str(src))
    q = (
        streaming_heatmap(stream, zoom=8, window="1 hour", watermark="0 seconds")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("heat")
        .option("checkpointLocation", str(tmp_path / "ckpt_heat"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["ws"], r["tile_x"], r["tile_y"]): (r["n_points"], r["density_x16"])
        for r in spark.sql(
            "SELECT window.start AS ws, tile_x, tile_y, n_points, density_x16 FROM heat"
        ).collect()
    }
    assert got, "no closed windows emitted"

    # batch reference: per hourly window, the batch convolution
    wb = batch.withColumn("ws", F.window(F.col("ts"), "1 hour").getField("start"))
    exp = {}
    for ws_row in wb.select("ws").distinct().collect():
        ws = ws_row["ws"]
        sub = with_tiles(wb.where(F.col("ws") == F.lit(ws)), zoom=8, quadkey=False)
        for r in smoothed_tile_density(sub, zoom=8).collect():
            exp[(ws, r["tile_x"], r["tile_y"])] = (r["n_points"], r["density_x16"])
    last_ws = max(ws for ws, _, _ in exp)
    exp_closed = {k: v for k, v in exp.items() if k[0] < last_ws}
    got_closed = {k: v for k, v in got.items() if k[0] < last_ws}
    assert got_closed == exp_closed
    # Python-free streaming plan
    plan = streaming_heatmap(stream, zoom=8)._jdf.queryExecution().analyzed().toString()
    assert "PythonUDF" not in plan and "mapInPandas" not in plan.lower()
