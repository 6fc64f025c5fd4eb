"""convex_hulls tests: the defining properties on random integer point
clouds (containment of every point, strict corners, CCW order, vertices
drawn from the input), degenerate groups, determinism, and the
coordinate-range guard."""

from __future__ import annotations

import numpy as np
import pytest

from fairy_core_spark.spatial.ops import convex_hulls

SCHEMA = "group_id string, x long, y long"


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _check_hull(points, hull):
    # vertices come from the input
    pset = {tuple(p) for p in points}
    assert all(tuple(v) in pset for v in hull)
    if len(hull) >= 3:
        n = len(hull)
        for i in range(n):
            o, a = hull[i], hull[(i + 1) % n]
            # strict corner at a (no collinear hull vertices)
            b = hull[(i + 2) % n]
            assert _cross(o, a, b) > 0
            # every point weakly left of every CCW edge -> containment
            for p in points:
                assert _cross(o, a, p) >= 0
    # starts at lexicographic min
    assert tuple(hull[0]) == min(pset)


def test_properties_on_random_clouds(spark):
    rng = np.random.default_rng(71)
    groups = {}
    rows = []
    for g in range(25):
        n = int(rng.integers(1, 60))
        pts = [(int(rng.integers(-500, 500)), int(rng.integers(-500, 500)))
               for _ in range(n)]
        groups[f"g{g}"] = pts
        rows += [(f"g{g}", x, y) for x, y in pts]
    out = convex_hulls(spark.createDataFrame(rows, SCHEMA)).collect()
    by_g: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r.group_id, r.seq)):
        by_g.setdefault(r.group_id, []).append((r.x, r.y))
    assert set(by_g) == set(groups)
    for g, pts in groups.items():
        _check_hull(pts, by_g[g])


def test_known_square_with_interior_and_edge_points(spark):
    pts = [(0, 0), (10, 0), (10, 10), (0, 10), (5, 5), (5, 0), (0, 3)]
    rows = [("s", x, y) for x, y in pts]
    out = sorted(convex_hulls(spark.createDataFrame(rows, SCHEMA)).collect(),
                 key=lambda r: r.seq)
    # collinear edge points (5,0) and (0,3) dropped; CCW from (0,0)
    assert [(r.x, r.y) for r in out] == [(0, 0), (10, 0), (10, 10), (0, 10)]


def test_degenerate_groups(spark):
    rows = [("one", 3, 4)] + [("col", i, 2 * i) for i in range(5)]
    out = convex_hulls(spark.createDataFrame(rows, SCHEMA)).collect()
    got: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r.group_id, r.seq)):
        got.setdefault(r.group_id, []).append((r.x, r.y))
    assert got["one"] == [(3, 4)]
    assert got["col"] == [(0, 0), (4, 8)]  # collinear set -> its extremes


def test_deterministic_under_partitioning(spark):
    rng = np.random.default_rng(73)
    pts = [("g", int(rng.integers(-99, 99)), int(rng.integers(-99, 99)))
           for _ in range(200)]
    a = sorted(convex_hulls(spark.createDataFrame(pts, SCHEMA)).collect())
    b = sorted(
        convex_hulls(
            spark.createDataFrame(list(reversed(pts)), SCHEMA).repartition(9)
        ).collect()
    )
    assert a == b


def test_range_guard(spark):
    rows = [("g", 1 << 30, 0), ("g", 0, 0), ("g", 1, 1)]
    with pytest.raises(Exception, match="2\\^30"):
        convex_hulls(spark.createDataFrame(rows, SCHEMA)).collect()


def test_composes_with_polygon_stats(spark):
    """Hull vertices feed polygon_stats directly: per-entity footprint
    area — the hull is CCW and strict-cornered, so area2 > 0 and equals
    the brute-force shoelace of the reference hull."""
    from fairy_core_spark.spatial.ops import polygon_stats
    from pyspark.sql import functions as F

    rng = np.random.default_rng(79)
    pts = [("g", int(rng.integers(-400, 400)), int(rng.integers(-400, 400)))
           for _ in range(150)]
    hull = convex_hulls(spark.createDataFrame(pts, SCHEMA))
    rings = (
        hull.groupBy("group_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("seq", "x", "y"))).alias("sv")
        )
        .select(
            F.col("group_id").alias("polygon_id"),
            F.expr("transform(sv, v -> struct(v.x AS x, v.y AS y))").alias("ring"),
        )
    )
    row = polygon_stats(rings).collect()[0]
    ordered = [(r.x, r.y) for r in sorted(hull.collect(), key=lambda h: h.seq)]
    a2 = sum(
        x0 * y1 - x1 * y0
        for (x0, y0), (x1, y1) in zip(ordered, ordered[1:] + ordered[:1])
    )
    assert row.area2 == a2 > 0
