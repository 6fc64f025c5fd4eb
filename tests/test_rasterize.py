"""rasterize_segments tests: exact parity with a Python DDA reference,
8-connectivity of the walk, endpoint coverage, and degenerate segments."""

from __future__ import annotations

import numpy as np

from fairy_core_spark.spatial.webmercator import py_tile, rasterize_segments

SCHEMA = "seg_id long, lat0 double, lon0 double, lat1 double, lon1 double"


def _ref_tiles(lat0, lon0, lat1, lon1, zoom):
    x0, y0 = py_tile(lat0, lon0, zoom)
    x1, y1 = py_tile(lat1, lon1, zoom)
    dx, dy = x1 - x0, y1 - y0
    n = max(abs(dx), abs(dy))
    if n == 0:
        return {(x0, y0)}
    out = set()
    for t in range(n + 1):
        out.add(
            (x0 + (2 * dx * t + n) // (2 * n), y0 + (2 * dy * t + n) // (2 * n))
        )
    return out


def _rand_segments(rng, n):
    return [
        (i, float(rng.uniform(-70, 70)), float(rng.uniform(-170, 170)),
         float(rng.uniform(-70, 70)), float(rng.uniform(-170, 170)))
        for i in range(n)
    ]


def test_matches_python_dda(spark):
    rng = np.random.default_rng(67)
    segs = _rand_segments(rng, 80)
    out = rasterize_segments(spark.createDataFrame(segs, SCHEMA), zoom=7).collect()
    got: dict[int, set] = {}
    for r in out:
        got.setdefault(r.seg_id, set()).add((r.tile_x, r.tile_y))
    for i, la0, lo0, la1, lo1 in segs:
        assert got[i] == _ref_tiles(la0, lo0, la1, lo1, 7), i


def test_walk_is_8_connected_and_covers_endpoints(spark):
    segs = [(1, 10.0, 10.0, 35.0, 80.0), (2, -40.0, 100.0, -41.0, 99.0)]
    out = rasterize_segments(spark.createDataFrame(segs, SCHEMA), zoom=8).collect()
    for sid, la0, lo0, la1, lo1 in segs:
        tiles = {(r.tile_x, r.tile_y) for r in out if r.seg_id == sid}
        from fairy_core_spark.spatial.webmercator import py_tile

        assert py_tile(la0, lo0, 8) in tiles and py_tile(la1, lo1, 8) in tiles
        # replay the ordered walk and assert chebyshev-adjacent steps
        ref = sorted(_ref_tiles(la0, lo0, la1, lo1, 8))
        assert tiles == set(ref)
        x0, y0 = py_tile(la0, lo0, 8)
        x1, y1 = py_tile(la1, lo1, 8)
        n = max(abs(x1 - x0), abs(y1 - y0))
        walk = [
            (x0 + (2 * (x1 - x0) * t + n) // (2 * n),
             y0 + (2 * (y1 - y0) * t + n) // (2 * n))
            for t in range(n + 1)
        ]
        for a, b in zip(walk, walk[1:]):
            assert max(abs(a[0] - b[0]), abs(a[1] - b[1])) <= 1


def test_degenerate_segment_single_tile(spark):
    segs = [(9, 20.0, 30.0, 20.0001, 30.0001)]  # same tile at zoom 5
    out = rasterize_segments(spark.createDataFrame(segs, SCHEMA), zoom=5).collect()
    assert len(out) == 1


def test_no_python_in_plan(spark):
    segs = [(1, 0.0, 0.0, 10.0, 10.0)]
    df = rasterize_segments(spark.createDataFrame(segs, SCHEMA), zoom=6)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Arrow" not in plan
