"""flow_sector_rollup: brute-force parity on random walks, exact
diagonal/axis sector boundaries, zero-move dropping, and partition
invariance."""

from __future__ import annotations

import math

import numpy as np
import pytest

from fairy_core_spark.spatial.trajectory import flow_sector_rollup

SCHEMA = "user_id long, ts long, event_id long, lat double, lon double"
ZOOM = 6


def _rand_rows(rng, n_users, hops):
    rows = []
    eid = 0
    for u in range(n_users):
        lat = float(rng.uniform(-60.0, 60.0))
        lon = float(rng.uniform(-170.0, 170.0))
        for t in range(hops):
            rows.append((u, t * 10, eid, round(lat, 3), round(lon, 3)))
            eid += 1
            lat += float(rng.uniform(-0.4, 0.4))
            lon += float(rng.uniform(-0.4, 0.4))
    return rows


def _tile(lat, lon, zoom):
    n = 1 << zoom
    x = min(max(int(math.floor((lon + 180.0) / 360.0 * float(n))), 0), n - 1)
    phi = min(max(lat, -85.05112878), 85.05112878) * (math.pi / 180.0)
    y = min(
        max(
            int(
                math.floor(
                    (1.0 - math.log(math.tan(phi) + 1.0 / math.cos(phi)) / math.pi)
                    / 2.0
                    * float(n)
                )
            ),
            0,
        ),
        n - 1,
    )
    return x, y


def _sector(dx, dy):
    if abs(dx) > abs(dy):
        return "E" if dx > 0 else "W"
    if abs(dy) > abs(dx):
        return "N" if dy > 0 else "S"
    if dx > 0:
        return "NE" if dy > 0 else "SE"
    return "NW" if dy > 0 else "SW"


def _brute(rows, zoom):
    by_user = {}
    for u, ts, eid, lat, lon in rows:
        by_user.setdefault(u, []).append((ts, eid, lat, lon))
    agg = {}
    for pts in by_user.values():
        pts.sort()
        for (_, _, la1, lo1), (_, _, la2, lo2) in zip(pts, pts[1:]):
            m1 = (round(la1 * 1000), round(lo1 * 1000))
            m2 = (round(la2 * 1000), round(lo2 * 1000))
            if m1 == m2:
                continue
            dx, dy = m2[1] - m1[1], m2[0] - m1[0]
            key = (*_tile(la1, lo1, zoom), _sector(dx, dy))
            n, sx, sy = agg.get(key, (0, 0, 0))
            agg[key] = (n + 1, sx + dx, sy + dy)
    return agg


def test_matches_bruteforce(spark):
    rng = np.random.default_rng(131)
    rows = _rand_rows(rng, 30, 12)
    df = spark.createDataFrame(rows, SCHEMA)
    out = flow_sector_rollup(df, ZOOM, tiebreak_col="event_id").collect()
    got = {(r.x, r.y, r.sector): (r.n_moves, r.dx_sum, r.dy_sum) for r in out}
    assert got == _brute(rows, ZOOM)
    assert len(got) > 8  # non-vacuous: many tiles and sectors hit


def test_exact_boundaries(spark):
    # hops engineered in exact millidegrees: pure-east, pure-north,
    # exact NE diagonal, exact SE diagonal
    rows = [
        (0, 0, 0, 10.000, 10.000),
        (0, 10, 1, 10.000, 10.005),  # dx=5, dy=0 -> E
        (0, 20, 2, 10.005, 10.005),  # dx=0, dy=5 -> N
        (0, 30, 3, 10.010, 10.010),  # dx=5, dy=5 -> NE
        (0, 40, 4, 10.005, 10.015),  # dx=5, dy=-5 -> SE
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = flow_sector_rollup(df, ZOOM, tiebreak_col="event_id").collect()
    assert sorted(r.sector for r in out) == ["E", "N", "NE", "SE"]
    m = {r.sector: (r.dx_sum, r.dy_sum) for r in out}
    assert m["NE"] == (5, 5) and m["SE"] == (5, -5)


def test_zero_moves_dropped(spark):
    rows = [(0, t, t, 5.0, 5.0) for t in range(4)]  # stationary
    df = spark.createDataFrame(rows, SCHEMA)
    assert flow_sector_rollup(df, ZOOM, tiebreak_col="event_id").count() == 0


def test_partition_invariant(spark):
    rng = np.random.default_rng(137)
    rows = _rand_rows(rng, 25, 10)
    key = lambda recs: sorted(
        (r.x, r.y, r.sector, r.n_moves, r.dx_sum, r.dy_sum) for r in recs
    )
    a = key(
        flow_sector_rollup(
            spark.createDataFrame(rows, SCHEMA).repartition(1),
            ZOOM,
            tiebreak_col="event_id",
        ).collect()
    )
    b = key(
        flow_sector_rollup(
            spark.createDataFrame(rows, SCHEMA).repartition(13),
            ZOOM,
            tiebreak_col="event_id",
        ).collect()
    )
    assert a == b and a
