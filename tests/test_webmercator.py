"""Web-Mercator XYZ tile + quadkey encoding (spatial/webmercator.py)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from fairy_core_spark.spatial.webmercator import (
    MAX_LAT,
    bbox_tile_filter,
    parent_tile,
    py_tile,
    quadkey_col,
    tile_x_col,
    tile_y_col,
    with_tiles,
)


def _rand_points(n=400, seed=11):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-88.0, 88.0, n)  # crosses the mercator clamp
    lon = rng.uniform(-180.0, 180.0, n)
    return [(int(i), float(a), float(o)) for i, (a, o) in enumerate(zip(lat, lon))]


def test_published_quadkey_vector(spark):
    """Bing Maps Tile System doc: tile (x=3, y=5) at level 3 -> '213'."""
    df = spark.createDataFrame([(3, 5)], "x long, y long")
    got = df.select(quadkey_col(F.col("x"), F.col("y"), 3).alias("qk")).first()["qk"]
    assert got == "213"


def test_exact_anchors(spark):
    """Formula-independent anchors: world center, edges, pole clamp."""
    for zoom in (1, 4, 9):
        n = 1 << zoom
        rows = [
            (1, 0.0, 0.0),       # center -> (n/2, n/2)
            (2, 0.0, -180.0),    # west edge -> x = 0
            (3, 0.0, 180.0),     # east edge clamps to last column
            (4, 89.9, 0.0),      # beyond mercator clamp -> y = 0
            (5, -89.9, 0.0),     # -> y = n-1
            (6, MAX_LAT, 0.0),   # exactly at the clamp -> y = 0
        ]
        df = spark.createDataFrame(rows, "i long, lat double, lon double")
        got = {
            r["i"]: (r["x"], r["y"])
            for r in df.select(
                "i",
                tile_x_col(F.col("lon"), zoom).alias("x"),
                tile_y_col(F.col("lat"), zoom).alias("y"),
            ).collect()
        }
        assert got[1] == (n // 2, n // 2)
        assert got[2][0] == 0
        assert got[3][0] == n - 1
        assert got[4][1] == 0
        assert got[5][1] == n - 1
        assert got[6][1] == 0


def test_columns_match_scalar_twin(spark):
    """Spark Column math == py_tile on random points at several zooms."""
    pts = _rand_points()
    df = spark.createDataFrame(pts, "i long, lat double, lon double")
    for zoom in (0, 3, 7, 15):
        got = {
            r["i"]: (r["x"], r["y"])
            for r in df.select(
                "i",
                tile_x_col(F.col("lon"), zoom).alias("x"),
                tile_y_col(F.col("lat"), zoom).alias("y"),
            ).collect()
        }
        for i, lat, lon in pts:
            assert got[i] == py_tile(lat, lon, zoom), (i, lat, lon, zoom)


def test_y_hemisphere_symmetry(spark):
    """tile_y(-lat) == n-1 - tile_y(lat) away from tile boundaries."""
    zoom, n = 8, 256
    pts = [(i, 0.37 + i * 0.3137) for i in range(200)]
    df = spark.createDataFrame(pts, "i long, lat double")
    rows = df.select(
        "i",
        tile_y_col(F.col("lat"), zoom).alias("yn"),
        tile_y_col(-F.col("lat"), zoom).alias("ys"),
    ).collect()
    assert rows and all(r["ys"] == n - 1 - r["yn"] for r in rows)


def test_quadkey_prefix_is_parent(spark):
    """quadkey(z) == quadkey(parent, z-1) + last digit; digit in 0..3."""
    zoom = 9
    pts = _rand_points(150, seed=5)
    df = spark.createDataFrame(pts, "i long, lat double, lon double")
    tiled = with_tiles(df, zoom)
    px, py_ = parent_tile(F.col("tile_x"), F.col("tile_y"))
    rows = tiled.select(
        "quadkey", quadkey_col(px, py_, zoom - 1).alias("pqk")
    ).collect()
    for r in rows:
        assert len(r["quadkey"]) == zoom
        assert r["quadkey"][:-1] == r["pqk"]
        assert r["quadkey"][-1] in "0123"


def test_quadkey_zoom_zero_empty(spark):
    df = spark.createDataFrame([(0, 0)], "x long, y long")
    assert df.select(quadkey_col(F.col("x"), F.col("y"), 0).alias("q")).first()["q"] == ""


def test_bbox_tile_filter_conservative(spark):
    """Every point inside the bbox survives the tile predicate; the
    predicate prunes most of the world at zoom 8."""
    pts = _rand_points(600, seed=23)
    df = with_tiles(spark.createDataFrame(pts, "i long, lat double, lon double"), 8)
    lat0, lat1, lon0, lon1 = -10.0, 25.0, 30.0, 80.0
    kept = df.where(bbox_tile_filter(lat0, lat1, lon0, lon1, 8))
    kept_ids = {r["i"] for r in kept.select("i").collect()}
    inside = {
        i for i, lat, lon in pts if lat0 <= lat <= lat1 and lon0 <= lon <= lon1
    }
    assert inside <= kept_ids
    assert len(kept_ids) < len(pts) / 2  # actually prunes


def test_bbox_tile_filter_wrapped_dateline(spark):
    """Pacific viewport (west 150E, east 150W): exactly the points within
    either dateline half survive — none from the excluded mid band; a
    non-wrapping call (lon_w <= lon_e) matches bbox_tile_filter verbatim."""
    from fairy_core_spark.spatial.webmercator import bbox_tile_filter_wrapped

    pts = _rand_points(600, seed=29)
    df = with_tiles(spark.createDataFrame(pts, "i long, lat double, lon double"), 8)
    lat0, lat1, lon_w, lon_e = -40.0, 40.0, 150.0, -150.0
    kept_ids = {
        r["i"]
        for r in df.where(
            bbox_tile_filter_wrapped(lat0, lat1, lon_w, lon_e, 8)
        ).select("i").collect()
    }
    inside = {
        i
        for i, lat, lon in pts
        if lat0 <= lat <= lat1 and (lon >= lon_w or lon <= lon_e)
    }
    assert inside <= kept_ids  # conservative: never drops an inside point
    # tile-rectangle cover is tight to within the two edge tile columns
    assert len(kept_ids) < len(pts) / 2
    # every survivor is inside the (tile-widened) union, never the mid band:
    # one zoom-8 tile spans 360/256 deg of lon, so allow that slack
    slack = 360.0 / 256 + 1e-9
    for i, lat, lon in pts:
        if i in kept_ids:
            assert lon >= lon_w - slack or lon <= lon_e + slack
            assert lat0 - 1.0 <= lat <= lat1 + 1.0
    # degenerate to the plain filter when not wrapping
    plain = {
        r["i"]
        for r in df.where(
            bbox_tile_filter_wrapped(-10.0, 25.0, 30.0, 80.0, 8)
        ).select("i").collect()
    }
    ref = {
        r["i"]
        for r in df.where(bbox_tile_filter(-10.0, 25.0, 30.0, 80.0, 8))
        .select("i")
        .collect()
    }
    assert plain == ref


def test_rejects_bad_args(spark):
    with pytest.raises(ValueError, match="zoom"):
        py_tile(0.0, 0.0, 24)
    with pytest.raises(ValueError, match="zoom"):
        tile_x_col(F.lit(0.0), -1)
    with pytest.raises(ValueError, match="bbox"):
        bbox_tile_filter(10.0, -10.0, 0.0, 1.0, 5)


def test_pyramid_prefix_rollup(spark):
    """pyramid == per-zoom substring rollup recomputed in Python; zoom-0
    level collapses everything to the '' root tile."""
    from fairy_core_spark.spatial.webmercator import pyramid, with_tiles

    pts = _rand_points(200, seed=31)
    df = with_tiles(spark.createDataFrame(pts, "i long, lat double, lon double"), 10)
    qks = [r["quadkey"] for r in df.select("quadkey").collect()]
    out = pyramid(df.select("quadkey"), zooms=(10, 6, 0))
    got = {}
    for r in out.groupBy("res", "cell").count().collect():
        got[(r["res"], r["cell"])] = r["count"]
    want = {}
    for z in (10, 6, 0):
        for qk in qks:
            k = (z, qk[:z])
            want[k] = want.get(k, 0) + 1
    assert got == want
    assert got[(0, "")] == len(qks)


def test_pyramid_rejects_bad_zooms(spark):
    from fairy_core_spark.spatial.webmercator import pyramid

    df = spark.createDataFrame([("012",)], "quadkey string")
    with pytest.raises(ValueError, match="zooms"):
        pyramid(df, zooms=())
    with pytest.raises(ValueError, match="zooms"):
        pyramid(df, zooms=(3, 24))


def test_quadkey_range_filter_matches_cover_membership(spark):
    """Rows kept by the merged BETWEEN predicate == rows whose cover-zoom
    tile lies in the bbox's tile rectangle (exact, both cover zooms)."""
    from fairy_core_spark.spatial.webmercator import (
        cluster_by_quadkey,
        py_tile,
        quadkey_range_filter,
    )

    pts = _rand_points(800, seed=47)
    df = spark.createDataFrame(pts, "i long, lat double, lon double")
    zoom = 9
    tiled = cluster_by_quadkey(df, zoom, n_partitions=4)
    bbox = (-20.0, 15.0, 10.0, 70.0)
    lat0, lat1, lon0, lon1 = bbox
    for cover_zoom in (4, 7):
        kept = {
            r["i"]
            for r in tiled.where(
                quadkey_range_filter(*bbox, zoom, cover_zoom=cover_zoom)
            ).collect()
        }
        x_lo, y_lo = py_tile(lat1, lon0, cover_zoom)
        x_hi, y_hi = py_tile(lat0, lon1, cover_zoom)
        want = set()
        for i, lat, lon in pts:
            x, y = py_tile(lat, lon, cover_zoom)
            if x_lo <= x <= x_hi and y_lo <= y <= y_hi:
                want.add(i)
        assert kept == want, cover_zoom
        inside = {
            i for i, lat, lon in pts
            if lat0 <= lat <= lat1 and lon0 <= lon <= lon1
        }
        assert inside <= kept  # conservative


def test_quadkey_layout_prunes_rowgroups_at_the_scan(spark, tmp_path):
    """Same proof as the zorder/S2 layouts: the SAME bbox query reads
    >=8x fewer parquet rows under cluster_by_quadkey than under a random
    layout — footer min/max stats on the stored quadkey column prune."""
    from fairy_core_spark.spatial.webmercator import (
        cluster_by_quadkey,
        quadkey_range_filter,
        with_tiles,
    )
    from tests.test_zorder import _scan_output_rows

    n = 200_000
    zoom = 12
    pts = spark.range(n).select(
        F.col("id").alias("point_id"),
        (((F.col("id") * 7919) % 120000) / 1000.0 - 60.0).alias("lat"),
        (((F.col("id") * 104729) % 360000) / 1000.0 - 180.0).alias("lon"),
    )
    clustered_path = str(tmp_path / "clustered")
    random_path = str(tmp_path / "random")
    cluster_by_quadkey(pts, zoom, n_partitions=16).write.option(
        "parquet.block.size", 64 * 1024
    ).parquet(clustered_path)
    with_tiles(pts, zoom).drop("tile_x", "tile_y").repartition(16).write.option(
        "parquet.block.size", 64 * 1024
    ).parquet(random_path)

    bbox = (10.0, 25.0, 40.0, 55.0)
    lat0, lat1, lon0, lon1 = bbox

    def q(path):
        df = spark.read.parquet(path)
        return df.where(quadkey_range_filter(*bbox, zoom)).where(
            F.col("lat").between(lat0, lat1) & F.col("lon").between(lon0, lon1)
        )

    a = {r["point_id"] for r in q(clustered_path).collect()}
    b = {r["point_id"] for r in q(random_path).collect()}
    assert a == b and len(a) > 0

    read_clustered = _scan_output_rows(q(clustered_path))
    read_random = _scan_output_rows(q(random_path))
    assert read_clustered > 0
    assert read_random >= 8 * read_clustered, (read_clustered, read_random)


# ---------------------------------------------------------------- smoothing


def test_smoothed_tile_density_single_interior_point(spark):
    """One point away from grid edges -> the full 3x3 binomial stencil."""
    from fairy_core_spark.spatial.ops import smoothed_tile_density

    df = spark.createDataFrame([(10, 20)], "tile_x long, tile_y long")
    rows = {
        (r["tile_x"], r["tile_y"]): (r["n_points"], r["density_x16"])
        for r in smoothed_tile_density(df, zoom=6).collect()
    }
    assert len(rows) == 9
    assert rows[(10, 20)] == (1, 4)
    for dx in (-1, 1):
        assert rows[(10 + dx, 20)] == (0, 2)
        assert rows[(10, 20 + dx)] == (0, 2)
        for dy in (-1, 1):
            assert rows[(10 + dx, 20 + dy)] == (0, 1)


def test_smoothed_tile_density_edge_clipping(spark):
    """A corner tile's halo is clipped to the grid (zero-padding)."""
    from fairy_core_spark.spatial.ops import smoothed_tile_density

    df = spark.createDataFrame([(0, 0)], "tile_x long, tile_y long")
    rows = {
        (r["tile_x"], r["tile_y"]): r["density_x16"]
        for r in smoothed_tile_density(df, zoom=3).collect()
    }
    assert rows == {(0, 0): 4, (1, 0): 2, (0, 1): 2, (1, 1): 1}


def test_smoothed_tile_density_mass_conserved_interior(spark):
    """Away from edges the kernel sums to 16: total density_x16 == 16 * n,
    and per-tile n_points reproduces the raw histogram; weight_col path
    agrees with pre-expanded rows."""
    import numpy as np

    from fairy_core_spark.spatial.ops import smoothed_tile_density

    rng = np.random.default_rng(7)
    pts = [
        (int(rng.integers(5, 58)), int(rng.integers(5, 58))) for _ in range(300)
    ]
    df = spark.createDataFrame(pts, "tile_x long, tile_y long")
    out = smoothed_tile_density(df, zoom=6)
    total = out.agg(
        F.sum("density_x16").alias("d"), F.sum("n_points").alias("n")
    ).first()
    assert total["d"] == 16 * 300 and total["n"] == 300

    raw = {(r["tile_x"], r["tile_y"]): r["cnt"] for r in
           df.groupBy("tile_x", "tile_y").agg(F.count("*").alias("cnt")).collect()}
    for r in out.collect():
        assert r["n_points"] == raw.get((r["tile_x"], r["tile_y"]), 0)

    wdf = df.groupBy("tile_x", "tile_y").agg(F.count("*").alias("w"))
    wout = {
        (r["tile_x"], r["tile_y"]): (r["n_points"], r["density_x16"])
        for r in smoothed_tile_density(wdf, zoom=6, weight_col="w").collect()
    }
    base = {
        (r["tile_x"], r["tile_y"]): (r["n_points"], r["density_x16"])
        for r in out.collect()
    }
    assert wout == base


def test_phash_geo_spread_groups(spark):
    """Known groups: spread vs single-tile vs singleton-pruned."""
    import pytest as _pytest

    from fairy_core_spark.operators.dedup import phash_geo_spread

    rows = [
        (1, 100, 7),   # group 1: tiles {7, 9} -> spread
        (2, 100, 9),
        (3, 200, 5),   # group 2: tile {5} twice -> not spread
        (4, 200, 5),
        (5, 300, 1),   # singleton -> pruned by min_group=2
    ]
    df = spark.createDataFrame(rows, "image_id long, phash long, tile_key long")
    out = {
        r["phash"]: (r["n_images"], r["n_tiles"], r["is_spread"])
        for r in phash_geo_spread(df).collect()
    }
    assert out == {100: (2, 2, 1), 200: (2, 1, 0)}

    all_rows = {
        r["phash"]: r["n_images"]
        for r in phash_geo_spread(df, min_group=1).collect()
    }
    assert all_rows == {100: 2, 200: 2, 300: 1}

    with _pytest.raises(ValueError):
        phash_geo_spread(df, min_group=0)


def test_zonal_tile_stats_overlap_empty_and_weights(spark):
    """Overlapping zones both count a shared tile; an ocean zone emits
    (0, 0); the weight path matches pre-expanded rows; bad inputs raise."""
    from fairy_core_spark.spatial.webmercator import py_tile, zonal_tile_stats

    # place points by known lat/lon, tiles at zoom 4
    pts = [
        (1, 10.0, 10.0),
        (2, 10.0, 10.0),
        (3, 12.0, 14.0),
        (4, -40.0, -100.0),
    ]
    df = spark.createDataFrame(pts, "point_id long, lat double, lon double")
    from fairy_core_spark.spatial.webmercator import with_tiles

    tiled = with_tiles(df, zoom=4, quadkey=False)
    zones = [
        ("z_both", 5.0, 20.0, 5.0, 20.0),     # covers points 1-3
        ("z_over", 8.0, 13.0, 8.0, 16.0),     # overlaps z_both
        ("z_sw", -45.0, -35.0, -105.0, -95.0),  # point 4
        ("z_empty", 60.0, 61.0, 60.0, 61.0),  # nothing
    ]
    out_df = zonal_tile_stats(tiled, zones, zoom=4)
    # the range join must broadcast the ZONE side (BuildRight of an inner
    # BNLJ) — broadcasting the occupied-tile frame would not survive deep
    # zooms at 100 TB
    plan = out_df._jdf.queryExecution().executedPlan().toString()
    seg = plan[plan.index("BroadcastNestedLoopJoin") :][:120]
    assert "BuildRight" in seg and "Inner" in seg, seg
    out = {
        r["zone_id"]: (r["n_tiles"], r["n_points"]) for r in out_df.collect()
    }
    assert out["z_empty"] == (0, 0)
    assert out["z_sw"] == (1, 1)
    assert out["z_both"][1] == 3 and out["z_both"][0] >= 1
    assert out["z_over"][1] == 3  # same tiles, conservative bbox cover
    assert set(out) == {"z_both", "z_over", "z_sw", "z_empty"}

    wdf = tiled.groupBy("tile_x", "tile_y").agg(F.count("*").alias("w"))
    wout = {
        r["zone_id"]: (r["n_tiles"], r["n_points"])
        for r in zonal_tile_stats(wdf, zones, zoom=4, weight_col="w").collect()
    }
    assert wout == out

    import pytest as _pytest

    with _pytest.raises(ValueError):
        zonal_tile_stats(tiled, [], zoom=4)
    with _pytest.raises(ValueError):
        zonal_tile_stats(tiled, [("bad", 5.0, 4.0, 0.0, 1.0)], zoom=4)
    with _pytest.raises(ValueError, match="duplicate zone_id"):
        zonal_tile_stats(
            tiled, [("z", 0.0, 1.0, 0.0, 1.0), ("z", 10.0, 11.0, 10.0, 11.0)], zoom=4
        )

    # corner-convention cross-check: the contained point's tile must lie
    # inside the z_sw zone's tile rectangle as zonal_tile_stats builds it
    # (NW corner from (lat1, lon0), SE from (lat0, lon1))
    x_lo, y_lo = py_tile(-35.0, -105.0, 4)
    x_hi, y_hi = py_tile(-45.0, -95.0, 4)
    px, py_ = py_tile(-40.0, -100.0, 4)
    assert x_lo <= px <= x_hi and y_lo <= py_ <= y_hi


def test_adaptive_tiles_planted_skew(spark):
    """Prefix-free, mass-conserving, cap-respecting; a planted dense
    block splits to zmax while the sparse world stays coarse."""
    import numpy as np

    from fairy_core_spark.spatial.webmercator import adaptive_tiles, with_tiles

    rng = np.random.default_rng(3)
    pts = [
        (i, 40.0 + rng.uniform(0, 0.01), -74.0 + rng.uniform(0, 0.01))
        for i in range(800)
    ] + [
        (1000 + i, float(rng.uniform(-60, 60)), float(rng.uniform(-170, 170)))
        for i in range(200)
    ]
    df = spark.createDataFrame(pts, "point_id long, lat double, lon double")
    tiled = with_tiles(df, zoom=10)
    out = adaptive_tiles(tiled, zmin=2, zmax=10, max_count=30).collect()

    cells = [r["cell"] for r in out]
    for a in cells:
        for b in cells:
            assert a == b or not b.startswith(a), (a, b)  # prefix-free
    assert sum(r["n_points"] for r in out) == 1000  # partitions the input
    for r in out:
        if r["is_hot_leaf"]:
            assert r["zoom"] == 10 and r["n_points"] > 30
        else:
            assert r["n_points"] <= 30
    assert min(r["zoom"] for r in out) == 2  # sparse world stays coarse
    assert max(r["zoom"] for r in out) == 10  # dense block fully split
    assert sum(r["is_hot_leaf"] for r in out) >= 1


def test_adaptive_tiles_validation_and_degenerate(spark):
    import pytest as _pytest

    from fairy_core_spark.spatial.webmercator import adaptive_tiles, with_tiles

    df = spark.createDataFrame(
        [(1, 10.0, 10.0), (2, 10.0, 10.0)], "point_id long, lat double, lon double"
    )
    tiled = with_tiles(df, zoom=5)
    with _pytest.raises(ValueError):
        adaptive_tiles(tiled, zmin=6, zmax=5, max_count=1)
    with _pytest.raises(ValueError):
        adaptive_tiles(tiled, zmin=2, zmax=5, max_count=0)
    # zmin == zmax: the hot leaf IS the only node
    out = adaptive_tiles(tiled, zmin=5, zmax=5, max_count=1).collect()
    assert len(out) == 1 and out[0]["is_hot_leaf"] == 1 and out[0]["n_points"] == 2
    # wrong-zoom quadkey fails loudly
    bad = with_tiles(df, zoom=4)
    with _pytest.raises(Exception, match="base zoom"):
        adaptive_tiles(bad, zmin=2, zmax=5, max_count=1).collect()


def test_smoothed_tile_density_rejects_out_of_grid_input(spark):
    """Input tiles outside [0, 2^zoom-1]^2 fail loudly (they'd otherwise
    be silently clipped, erasing their mass); bad zooms are rejected."""
    import pytest as _pytest

    from fairy_core_spark.spatial.ops import smoothed_tile_density

    df = spark.createDataFrame([(100, 3)], "tile_x long, tile_y long")
    with _pytest.raises(Exception, match="outside"):
        smoothed_tile_density(df, zoom=6).collect()
    with _pytest.raises(ValueError, match="zoom"):
        smoothed_tile_density(df, zoom=-1)
    with _pytest.raises(ValueError, match="zoom"):
        smoothed_tile_density(df, zoom=50)


def test_idw_fill_hand_checked(spark):
    """Two occupied tiles -> hand-derived integer num/den at known empty
    tiles; occupied absent; Chebyshev-radius bound respected."""
    from fairy_core_spark.spatial.ops import idw_fill

    rows = [(5, 5)] * 4 + [(7, 5)] * 2
    df = spark.createDataFrame(rows, "tile_x long, tile_y long")
    out = {
        (r.tile_x, r.tile_y): (r.idw_num, r.idw_den, r.idw_value)
        for r in idw_fill(df, radius=2).collect()
    }
    # (6,5): both at d2=1 -> w=40 each (LCM(1,2,4,5,8)=40): (4+2)*40 / 80
    assert out[(6, 5)] == (240, 80, 3.0)
    # (3,5): only (5,5) at d2=4 -> w=10
    assert out[(3, 5)] == (40, 10, 4.0)
    # (6,6): d2=2 to both -> w=20 each: (4+2)*20 / 40 = 3.0
    assert out[(6, 6)] == (120, 40, 3.0)
    assert (5, 5) not in out and (7, 5) not in out  # occupied not emitted
    assert (10, 5) not in out  # beyond Chebyshev radius 2 of both
    # every emitted tile is within radius 2 of an occupied tile
    for x, y in out:
        assert min(max(abs(x - 5), abs(y - 5)), max(abs(x - 7), abs(y - 5))) <= 2


def test_idw_fill_grid_edge_and_guards(spark):
    """zoom bound drops off-grid fill targets; out-of-grid INPUT fails
    loudly; bad radius rejected."""
    import pytest as _pt
    from pyspark.sql.utils import AnalysisException

    from fairy_core_spark.spatial.ops import idw_fill

    corner = spark.createDataFrame([(0, 0)], "tile_x long, tile_y long")
    out = {(r.tile_x, r.tile_y) for r in idw_fill(corner, zoom=3, radius=2).collect()}
    assert all(0 <= x <= 7 and 0 <= y <= 7 for x, y in out)
    assert (1, 0) in out and (-1, 0) not in out

    bad = spark.createDataFrame([(9, 3)], "tile_x long, tile_y long")
    with _pt.raises(Exception, match="input tile outside"):
        idw_fill(bad, zoom=3).collect()

    with _pt.raises(ValueError, match="radius"):
        idw_fill(corner, radius=0)
