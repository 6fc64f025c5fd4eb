"""polygon_stats tests: exact shoelace vs a Python integer brute force
on random simple (star-shaped) polygons, orientation sign, known square,
and degenerate (zero-area) handling."""

from __future__ import annotations

import math

import numpy as np
import pytest

from fairy_core_spark.spatial.ops import polygon_stats


def _ring_df(spark, polys):
    rows = [(pid, [{"x": int(x), "y": int(y)} for x, y in ring]) for pid, ring in polys]
    return spark.createDataFrame(
        rows, "polygon_id string, ring array<struct<x: long, y: long>>"
    )


def _brute(ring):
    n = len(ring)
    a2 = cx6 = cy6 = 0
    for i in range(n):
        x0, y0 = ring[i]
        x1, y1 = ring[(i + 1) % n]
        c = x0 * y1 - x1 * y0
        a2 += c
        cx6 += (x0 + x1) * c
        cy6 += (y0 + y1) * c
    return a2, cx6, cy6


def _star_ring(rng, n_verts, r_lo=50, r_hi=4000):
    angles = sorted(rng.uniform(0, 2 * math.pi, n_verts))
    return [
        (int(rng.uniform(r_lo, r_hi) * math.cos(a)),
         int(rng.uniform(r_lo, r_hi) * math.sin(a)))
        for a in angles
    ]


def test_matches_bruteforce_on_random_star_polygons(spark):
    rng = np.random.default_rng(37)
    polys = [(f"p{i}", _star_ring(rng, int(rng.integers(3, 24)))) for i in range(60)]
    out = {r.polygon_id: r for r in polygon_stats(_ring_df(spark, polys)).collect()}
    assert len(out) == 60
    for pid, ring in polys:
        a2, cx6, cy6 = _brute(ring)
        r = out[pid]
        assert (r.n_vertices, r.area2, r.cx6, r.cy6) == (len(ring), a2, cx6, cy6)
        if a2 != 0:
            assert r.centroid_x == pytest.approx(cx6 / (3 * a2))
            assert r.centroid_y == pytest.approx(cy6 / (3 * a2))


def test_known_square(spark):
    ring = [(0, 0), (10, 0), (10, 10), (0, 10)]  # CCW unit-ish square
    r = polygon_stats(_ring_df(spark, [("sq", ring)])).collect()[0]
    assert r.area2 == 200  # 2 * 100
    assert (r.centroid_x, r.centroid_y) == (5.0, 5.0)


def test_orientation_flips_sign(spark):
    ccw = [(0, 0), (10, 0), (10, 10), (0, 10)]
    cw = list(reversed(ccw))
    out = {r.polygon_id: r for r in polygon_stats(
        _ring_df(spark, [("a", ccw), ("b", cw)])).collect()}
    assert out["a"].area2 == -out["b"].area2 == 200
    # centroid invariant under orientation
    assert out["b"].centroid_x == 5.0 and out["b"].centroid_y == 5.0


def test_degenerate_polygon_null_centroid(spark):
    line = [(0, 0), (5, 5), (10, 10)]  # collinear: area2 == 0
    r = polygon_stats(_ring_df(spark, [("d", line)])).collect()[0]
    assert r.area2 == 0 and r.centroid_x is None and r.centroid_y is None
