"""vector_tile_coords tests: agreement with py_tile, known midpoints,
edge clamping, pixel-resolution roundtrip, and the zero-Python plan."""

from __future__ import annotations

import numpy as np
import pytest

from fairy_core_spark.spatial.webmercator import py_tile, vector_tile_coords

SCHEMA = "point_id long, lat double, lon double"


def test_tiles_agree_with_py_tile_and_pixels_in_range(spark):
    rng = np.random.default_rng(79)
    pts = [(i, float(rng.uniform(-85, 85)), float(rng.uniform(-180, 180)))
           for i in range(500)]
    out = vector_tile_coords(spark.createDataFrame(pts, SCHEMA), zoom=13).collect()
    by_id = {r.point_id: r for r in out}
    for i, lat, lon in pts:
        r = by_id[i]
        assert (r.tile_x, r.tile_y) == py_tile(lat, lon, 13)
        assert 0 <= r.px < 4096 and 0 <= r.py < 4096


def test_known_center_point(spark):
    out = vector_tile_coords(
        spark.createDataFrame([(1, 0.0, 0.0)], SCHEMA), zoom=0
    ).collect()[0]
    assert (out.tile_x, out.tile_y, out.px, out.py) == (0, 0, 2048, 2048)


def test_antimeridian_and_pole_clamp_to_last_pixel(spark):
    out = vector_tile_coords(
        spark.createDataFrame([(1, -89.9, 180.0)], SCHEMA), zoom=4
    ).collect()[0]
    assert (out.tile_x, out.tile_y) == (15, 15)
    assert (out.px, out.py) == (4095, 4095)


def test_pixel_roundtrip_within_one_pixel(spark):
    rng = np.random.default_rng(83)
    pts = [(i, float(rng.uniform(-80, 80)), float(rng.uniform(-179, 179)))
           for i in range(200)]
    zoom, extent, n = 11, 4096, 1 << 11
    out = vector_tile_coords(
        spark.createDataFrame(pts, SCHEMA), zoom=zoom, extent=extent
    ).collect()
    by_id = {r.point_id: r for r in out}
    for i, lat, lon in pts:
        r = by_id[i]
        lon_back = (r.tile_x + r.px / extent) / n * 360.0 - 180.0
        # one pixel at zoom 11 is 360/(n*extent) ~ 4.3e-5 degrees
        assert abs(lon_back - lon) <= 360.0 / (n * extent) + 1e-9


def test_zero_python_plan_and_extent_guard(spark):
    df = spark.createDataFrame([(1, 10.0, 10.0)], SCHEMA)
    out = vector_tile_coords(df, zoom=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Arrow" not in plan
    with pytest.raises(ValueError):
        vector_tile_coords(df, zoom=5, extent=0)
