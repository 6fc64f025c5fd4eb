"""simplify_paths (Douglas-Peucker) tests: parity with a plain-Python
recursive reference, the error-bound contract (every dropped point within
tolerance of the kept polyline), endpoint/straight-line/zigzag behavior,
determinism under shuffled input, and the chunked wide-entity path."""

from __future__ import annotations

import math

import numpy as np
import pytest

from fairy_core_spark.spatial.trajectory import simplify_paths

SCHEMA = "user_id string, ts long, lat double, lon double"
R = 6_371_008.8


def _project(lats, lons):
    lat0, lon0 = lats[0], lons[0]
    y = np.radians(np.asarray(lats) - lat0) * R
    x = np.radians(np.asarray(lons) - lon0) * (R * math.cos(math.radians(lat0)))
    return x, y


def _seg_d(px, py, ax, ay, bx, by):
    dx, dy = bx - ax, by - ay
    seg2 = dx * dx + dy * dy
    if seg2 == 0:
        return math.hypot(px - ax, py - ay)
    t = max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / seg2))
    return math.hypot(px - (ax + t * dx), py - (ay + t * dy))


def _dp_ref(x, y, tol):
    if len(x) <= 2:
        return list(range(len(x)))
    dmax, idx = -1.0, 0
    for k in range(1, len(x) - 1):
        d = _seg_d(x[k], y[k], x[0], y[0], x[-1], y[-1])
        if d > dmax:
            dmax, idx = d, k
    if dmax <= tol:
        return [0, len(x) - 1]
    left = _dp_ref(x[: idx + 1], y[: idx + 1], tol)
    right = _dp_ref(x[idx:], y[idx:], tol)
    return left + [idx + r for r in right[1:]]


def _track(rng, n, lat0=40.0, lon0=-74.0):
    lat, lon, rows = lat0, lon0, []
    for i in range(n):
        rows.append(("u", i, lat, lon))
        lat += float(rng.normal(0, 0.001))
        lon += float(rng.normal(0, 0.001))
    return rows


def test_matches_recursive_reference(spark):
    rng = np.random.default_rng(41)
    rows = _track(rng, 120)
    out = sorted(
        simplify_paths(spark.createDataFrame(rows, SCHEMA), tolerance_m=60).collect(),
        key=lambda r: r.seq,
    )
    lats = [r[2] for r in rows]
    lons = [r[3] for r in rows]
    x, y = _project(lats, lons)
    ref = _dp_ref(list(x), list(y), 60.0)
    assert [r.ts for r in out] == ref  # ts == original index by construction


def test_error_bound_holds(spark):
    rng = np.random.default_rng(43)
    rows = _track(rng, 300)
    kept = sorted(
        simplify_paths(spark.createDataFrame(rows, SCHEMA), tolerance_m=80).collect(),
        key=lambda r: r.seq,
    )
    lats = [r[2] for r in rows]
    lons = [r[3] for r in rows]
    x, y = _project(lats, lons)
    kx = [x[r.ts] for r in kept]
    ky = [y[r.ts] for r in kept]
    kept_ts = {r.ts for r in kept}
    assert {0, len(rows) - 1} <= kept_ts
    for i in range(len(rows)):
        if i in kept_ts:
            continue
        d = min(
            _seg_d(x[i], y[i], kx[j], ky[j], kx[j + 1], ky[j + 1])
            for j in range(len(kx) - 1)
        )
        assert d <= 80.0 + 1e-6


def test_straight_line_collapses_zigzag_survives(spark):
    line = [("u", i, 40.0 + i * 0.001, -74.0) for i in range(50)]
    out = simplify_paths(spark.createDataFrame(line, SCHEMA), tolerance_m=10).collect()
    assert len(out) == 2
    zig = [("z", i, 40.0 + (i % 2) * 0.01, -74.0 + i * 0.01) for i in range(20)]
    outz = simplify_paths(spark.createDataFrame(zig, SCHEMA), tolerance_m=10).collect()
    assert len(outz) == 20  # ~1.1km zigzag amplitude >> 10m tolerance


def test_deterministic_under_shuffled_input(spark):
    rng = np.random.default_rng(47)
    rows = _track(rng, 150)
    a = sorted(
        simplify_paths(spark.createDataFrame(rows, SCHEMA), tolerance_m=40).collect()
    )
    shuffled = list(rows)
    rng.shuffle(shuffled)
    b = sorted(
        simplify_paths(
            spark.createDataFrame(shuffled, SCHEMA).repartition(7), tolerance_m=40
        ).collect()
    )
    assert a == b


def test_chunked_wide_entity_keeps_bound(spark):
    rng = np.random.default_rng(53)
    rows = _track(rng, 200)
    big = simplify_paths(
        spark.createDataFrame(rows, SCHEMA), tolerance_m=60, max_points=50
    ).collect()
    # chunk endpoints are always kept
    assert {0, 49, 98, 147, 199} <= {r.ts for r in big}
    # and the error bound — the actual contract — still holds
    lats = [r[2] for r in rows]
    lons = [r[3] for r in rows]
    x, y = _project(lats, lons)
    kept = sorted(big, key=lambda r: r.seq)
    kx = [x[r.ts] for r in kept]
    ky = [y[r.ts] for r in kept]
    kept_ts = {r.ts for r in kept}
    for i in range(len(rows)):
        if i not in kept_ts:
            d = min(
                _seg_d(x[i], y[i], kx[j], ky[j], kx[j + 1], ky[j + 1])
                for j in range(len(kx) - 1)
            )
            assert d <= 60.0 + 1e-6


def test_zero_tolerance_keeps_all(spark):
    rows = _track(np.random.default_rng(59), 30)
    out = simplify_paths(spark.createDataFrame(rows, SCHEMA), tolerance_m=0).collect()
    assert len(out) == 30


def test_multi_entity_independent(spark):
    rows = [("a", i, 40.0 + i * 0.001, -74.0) for i in range(30)]
    rows += [("b", i, 50.0 + (i % 2) * 0.01, 10.0 + i * 0.01) for i in range(10)]
    out = simplify_paths(spark.createDataFrame(rows, SCHEMA), tolerance_m=10).collect()
    got = {}
    for r in out:
        got[r.user_id] = got.get(r.user_id, 0) + 1
    assert got == {"a": 2, "b": 10}
