"""snap_points_to_segments: exact integer snap vs an independent
Fraction-arithmetic brute force over the same bounded-radius contract."""

from fractions import Fraction

import pytest
from pyspark.sql import functions as F


def _brute(points, segs, cand_pairs, scale_bits=20):
    """exact rational point-to-segment distance, floor-quantized; min per
    point by (dist_q, seg_id) — pure Python, no shared code with the
    engine beyond the candidate pair list."""
    best = {}
    for pid, sid in cand_pairs:
        px, py = points[pid]
        ax, ay, bx, by = segs[sid]
        dx, dy = bx - ax, by - ay
        l2 = dx * dx + dy * dy
        wx, wy = px - ax, py - ay
        if l2 == 0:
            d2 = Fraction(wx * wx + wy * wy)
        else:
            t = Fraction(wx * dx + wy * dy, l2)
            if t <= 0:
                d2 = Fraction(wx * wx + wy * wy)
            elif t >= 1:
                d2 = Fraction((px - bx) ** 2 + (py - by) ** 2)
            else:
                qx = Fraction(ax) + t * dx
                qy = Fraction(ay) + t * dy
                d2 = (px - qx) ** 2 + (py - qy) ** 2
        q = (d2.numerator * (1 << scale_bits)) // d2.denominator
        cur = best.get(pid)
        if cur is None or (q, sid) < cur:
            best[pid] = (q, sid)
    return {pid: (sid, q) for pid, (q, sid) in best.items()}


@pytest.fixture(scope="module")
def snapped(spark):
    from fairy_core_spark.spatial.ops import snap_points_to_segments
    from fairy_core_spark.spatial.webmercator import rasterize_segments, with_tiles

    zoom = 6
    segs = spark.range(1, 60).select(
        F.col("id").alias("seg_id"),
        (((F.col("id") * 7919) % 120000) / 1000.0 - 60.0).alias("lat0"),
        (((F.col("id") * 104729) % 360000) / 1000.0 - 180.0).alias("lon0"),
        (((F.col("id") * 104729) % 120000) / 1000.0 - 60.0).alias("lat1"),
        (((F.col("id") * 7919) % 360000) / 1000.0 - 180.0).alias("lon1"),
        ((F.col("id") * 104729) % 360000 - 180000).cast("long").alias("ax"),
        ((F.col("id") * 7919) % 120000 - 60000).cast("long").alias("ay"),
        ((F.col("id") * 7919) % 360000 - 180000).cast("long").alias("bx"),
        ((F.col("id") * 104729) % 120000 - 60000).cast("long").alias("by"),
    )
    pts = spark.range(1, 400).select(
        F.col("id").alias("point_id"),
        (((F.col("id") * 6151) % 120000) / 1000.0 - 60.0).alias("lat"),
        (((F.col("id") * 92821) % 360000) / 1000.0 - 180.0).alias("lon"),
        ((F.col("id") * 92821) % 360000 - 180000).cast("long").alias("px"),
        ((F.col("id") * 6151) % 120000 - 60000).cast("long").alias("py"),
    )
    got = {
        r["point_id"]: (r["seg_id"], r["dist_q"])
        for r in snap_points_to_segments(pts, segs, zoom).collect()
    }
    # independent candidate generation: engine rasterize (pinned by its own
    # tests) + python dilation + tile lookup
    n = 1 << zoom
    rast = rasterize_segments(segs, zoom).collect()
    tile2segs = {}
    for r in rast:
        for ddx in (-1, 0, 1):
            for ddy in (-1, 0, 1):
                tx, ty = r["tile_x"] + ddx, r["tile_y"] + ddy
                if 0 <= tx < n and 0 <= ty < n:
                    tile2segs.setdefault((tx, ty), set()).add(r["seg_id"])
    ptiles = {
        r["point_id"]: (r["tile_x"], r["tile_y"])
        for r in with_tiles(pts, zoom=zoom, quadkey=False).collect()
    }
    pcoords = {r["point_id"]: (r["px"], r["py"]) for r in pts.collect()}
    scoords = {
        r["seg_id"]: (r["ax"], r["ay"], r["bx"], r["by"]) for r in segs.collect()
    }
    pairs = [
        (pid, sid)
        for pid, t in ptiles.items()
        for sid in tile2segs.get(t, ())
    ]
    want = _brute(pcoords, scoords, pairs)
    return got, want


def test_matches_brute_force(snapped):
    got, want = snapped
    assert got == want
    assert len(got) > 100  # dense enough fixture to be meaningful


def test_unmatched_points_are_dropped(snapped):
    got, want = snapped
    # bounded radius: some points genuinely see no road tile
    assert len(got) < 399


def test_degenerate_zero_length_segment(spark):
    from fairy_core_spark.spatial.ops import snap_points_to_segments

    segs = spark.createDataFrame(
        [(1, 10.0, 10.0, 10.0, 10.0, 10000, 10000, 10000, 10000)],
        "seg_id long, lat0 double, lon0 double, lat1 double, lon1 double,"
        " ax long, ay long, bx long, by long",
    )
    pts = spark.createDataFrame(
        [(7, 10.001, 10.002, 10002, 10001)],
        "point_id long, lat double, lon double, px long, py long",
    )
    rows = snap_points_to_segments(pts, segs, 6).collect()
    assert len(rows) == 1
    # dist^2 = 2^2 + 1^2 = 5 mdeg^2, quantized exactly
    assert rows[0]["dist_q"] == 5 * (1 << 20)
    assert rows[0]["seg_id"] == 1


def test_isolated_points_matches_brute_force(spark):
    """bounded-radius nearest-neighbor vs python brute force over the
    same tile-halo candidate rule; sentinel contract for out-of-range."""
    from pyspark.sql import functions as F

    from fairy_core_spark.spatial.ops import isolated_points
    from fairy_core_spark.spatial.webmercator import with_tiles

    zoom = 6
    pts = spark.range(1, 500).select(
        F.col("id").alias("point_id"),
        (((F.col("id") * 6151) % 120000) / 1000.0 - 60.0).alias("lat"),
        (((F.col("id") * 92821) % 360000) / 1000.0 - 180.0).alias("lon"),
        ((F.col("id") * 92821) % 360000 - 180000).cast("long").alias("px"),
        ((F.col("id") * 6151) % 120000 - 60000).cast("long").alias("py"),
    )
    got = {
        r["point_id"]: (r["nn_id"], r["nn_dist_q"], r["isolated"])
        for r in isolated_points(pts, zoom).collect()
    }
    tiles = {
        r["point_id"]: (r["tile_x"], r["tile_y"])
        for r in with_tiles(pts, zoom=zoom, quadkey=False).collect()
    }
    coords = {r["point_id"]: (r["px"], r["py"]) for r in pts.collect()}
    n = 1 << zoom
    want = {}
    for pid, (tx, ty) in tiles.items():
        best = None
        for nid, (ntx, nty) in tiles.items():
            if nid == pid:
                continue
            # candidate iff the neighbor's dilated tile set covers pid's tile
            if abs(ntx - tx) <= 1 and abs(nty - ty) <= 1:
                px, py = coords[pid]
                nx, ny = coords[nid]
                d2 = (px - nx) ** 2 + (py - ny) ** 2
                if best is None or (d2, nid) < best:
                    best = (d2, nid)
        want[pid] = (best[1], best[0], False) if best else (-1, -1, True)
    assert got == want
    assert any(v[2] for v in want.values())      # fixture has isolated points
    assert any(not v[2] for v in want.values())  # and neighbored ones


def test_isolated_points_density_cap(spark):
    """max_per_tile: over-cap tile members resolve trivially (-2 sentinel,
    not isolated) and leave the candidate pool entirely; sub-cap points
    keep exact answers among the remaining pool; cap=None is unchanged."""
    from pyspark.sql import functions as F

    from fairy_core_spark.spatial.ops import isolated_points

    # 5 points stacked in one spot (dense tile) + 2 neighbors elsewhere
    rows = [(i, 10.0, 10.0, 10000 + i, 10000) for i in range(5)]
    rows += [(10, 10.4, 10.4, 10400, 10400), (11, 10.45, 10.4, 10400, 10450)]
    pts = spark.createDataFrame(
        rows, "point_id long, lat double, lon double, px long, py long"
    )
    got = {
        r["point_id"]: (r["nn_id"], r["nn_dist_q"], r["isolated"])
        for r in isolated_points(pts, 11, max_per_tile=3).collect()
    }
    for i in range(5):
        assert got[i] == (-2, -1, False)
    # the pair still answers exactly: d2 = 50^2
    assert got[10] == (11, 2500, False) and got[11] == (10, 2500, False)

    exact = {
        r["point_id"]: r["nn_id"]
        for r in isolated_points(pts, 11).collect()
    }
    assert exact[0] == 1  # cap=None keeps the exact per-point identity


def test_new_ops_plan_shapes(spark):
    """physical-plan contracts for the session's bounded-radius ops:
    map matching joins via BROADCAST (road side) with the per-point
    top-1 planned as WindowGroupLimit; no cartesian product anywhere;
    resampling plans with exactly ONE shuffle exchange."""
    from pyspark.sql import functions as F

    from fairy_core_spark.spatial.ops import snap_points_to_segments
    from fairy_core_spark.spatial.trajectory import resample_tracks

    segs = spark.range(1, 50).select(
        F.col("id").alias("seg_id"),
        (((F.col("id") * 7919) % 120000) / 1000.0 - 60.0).alias("lat0"),
        (((F.col("id") * 104729) % 360000) / 1000.0 - 180.0).alias("lon0"),
        (((F.col("id") * 104729) % 120000) / 1000.0 - 60.0).alias("lat1"),
        (((F.col("id") * 7919) % 360000) / 1000.0 - 180.0).alias("lon1"),
        F.lit(0).cast("long").alias("ax"), F.lit(0).cast("long").alias("ay"),
        F.lit(1).cast("long").alias("bx"), F.lit(1).cast("long").alias("by"),
    )
    pts = spark.range(1, 200).select(
        F.col("id").alias("point_id"),
        (((F.col("id") * 6151) % 120000) / 1000.0 - 60.0).alias("lat"),
        (((F.col("id") * 92821) % 360000) / 1000.0 - 180.0).alias("lon"),
        F.lit(2).cast("long").alias("px"), F.lit(2).cast("long").alias("py"),
    )
    snap = snap_points_to_segments(pts, segs, 6)
    plan = snap._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "WindowGroupLimit" in plan, plan
    assert "CartesianProduct" not in plan, plan

    import datetime as dt

    tracks = spark.createDataFrame(
        [("u", dt.datetime(2024, 1, 1), 1, 0, 0),
         ("u", dt.datetime(2024, 1, 1, 0, 0, 30), 2, 100, 100)],
        "user_id string, ts timestamp, event_id long, px long, py long",
    )
    rs = resample_tracks(tracks, interval_us=1_000_000)
    rplan = rs._jdf.queryExecution().executedPlan().toString()
    assert rplan.count("Exchange") == 1, rplan  # the one entity window
    assert "Python" not in rplan, rplan         # pure codegen after it


def test_streaming_map_match_foreachbatch_parity(spark, tmp_path):
    """live GPS snap: the window-bearing snap runs per micro-batch via
    foreachBatch against static (broadcast) roads — each batch's matches
    are byte-equal to running the batch operator on the same rows (the
    per-point top-1 needs no cross-batch state: a point appears once)."""
    from pyspark.sql import functions as F

    from fairy_core_spark.spatial.ops import snap_points_to_segments

    segs = spark.range(1, 40).select(
        F.col("id").alias("seg_id"),
        (((F.col("id") * 7919) % 120000) / 1000.0 - 60.0).alias("lat0"),
        (((F.col("id") * 104729) % 360000) / 1000.0 - 180.0).alias("lon0"),
        (((F.col("id") * 104729) % 120000) / 1000.0 - 60.0).alias("lat1"),
        (((F.col("id") * 7919) % 360000) / 1000.0 - 180.0).alias("lon1"),
        ((F.col("id") * 104729) % 360000 - 180000).cast("long").alias("ax"),
        ((F.col("id") * 7919) % 120000 - 60000).cast("long").alias("ay"),
        ((F.col("id") * 7919) % 360000 - 180000).cast("long").alias("bx"),
        ((F.col("id") * 104729) % 120000 - 60000).cast("long").alias("by"),
    ).cache()
    pts = spark.range(1, 300).select(
        F.col("id").alias("point_id"),
        (((F.col("id") * 6151) % 120000) / 1000.0 - 60.0).alias("lat"),
        (((F.col("id") * 92821) % 360000) / 1000.0 - 180.0).alias("lon"),
        ((F.col("id") * 92821) % 360000 - 180000).cast("long").alias("px"),
        ((F.col("id") * 6151) % 120000 - 60000).cast("long").alias("py"),
    )
    src = tmp_path / "pts"
    pts.repartition(3).write.parquet(str(src))

    got = []

    def sink(batch_df, batch_id):
        got.extend(
            (r["point_id"], r["seg_id"], r["dist_q"])
            for r in snap_points_to_segments(batch_df, segs, 6).collect()
        )

    stream = spark.readStream.schema(pts.schema).format("parquet").load(str(src))
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    want = sorted(
        (r["point_id"], r["seg_id"], r["dist_q"])
        for r in snap_points_to_segments(pts, segs, 6).collect()
    )
    assert sorted(got) == want and len(want) > 50
