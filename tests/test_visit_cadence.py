"""tile_visit_cadence: brute-force parity on random event streams, low-
median semantics on small cases, single-event tiles dropped, and
tie-order independence of the gap multiset."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from fairy_core_spark.spatial.trajectory import tile_visit_cadence

SCHEMA = "event_id long, ts timestamp, lat double, lon double"
ZOOM = 5
T0 = dt.datetime(2026, 1, 1)


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


def _brute(rows, zoom):
    per = {}
    for _e, ts, lat, lon in rows:
        per.setdefault(_tile(lat, lon, zoom), []).append(int(ts.timestamp() * 1e6))
    out = {}
    for k, uss in per.items():
        if len(uss) < 2:
            continue
        uss.sort()
        gaps = sorted(b - a for a, b in zip(uss, uss[1:]))
        med = gaps[(len(gaps) + 1) // 2 - 1]  # low median, 1-indexed rank
        out[k] = (len(uss), len(gaps), med, gaps[0], gaps[-1])
    return out


def _rand_rows(rng, n):
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                T0 + dt.timedelta(seconds=int(rng.integers(0, 500000))),
                float(rng.uniform(-50, 50)),
                float(rng.uniform(-100, 100)),
            )
        )
    return rows


def test_matches_bruteforce(spark):
    rng = np.random.default_rng(191)
    rows = _rand_rows(rng, 500)
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r.x, r.y): (r.n_visits, r.n_gaps, r.median_gap_us, r.min_gap_us, r.max_gap_us)
        for r in tile_visit_cadence(df, ZOOM).collect()
    }
    assert got == _brute(rows, ZOOM)
    assert got


def test_low_median_even_count(spark):
    # one tile, 5 events -> 4 gaps [1s, 2s, 3s, 10s]; low median = rank 2 = 2s
    secs = [0, 1, 3, 6, 16]
    rows = [(i, T0 + dt.timedelta(seconds=s), 10.0, 10.0) for i, s in enumerate(secs)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = tile_visit_cadence(df, ZOOM).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_visits, r.n_gaps, r.median_gap_us, r.min_gap_us, r.max_gap_us) == (
        5, 4, 2_000_000, 1_000_000, 10_000_000,
    )


def test_single_event_tiles_dropped(spark):
    rows = [(0, T0, 10.0, 10.0), (1, T0, -40.0, -90.0)]
    df = spark.createDataFrame(rows, SCHEMA)
    assert tile_visit_cadence(df, ZOOM).count() == 0


def test_equal_timestamps_deterministic(spark):
    # three events at the same instant + one later: gaps [0, 0, 5s]
    rows = [
        (0, T0, 20.0, 20.0),
        (1, T0, 20.0, 20.0),
        (2, T0, 20.0, 20.0),
        (3, T0 + dt.timedelta(seconds=5), 20.0, 20.0),
    ]
    for parts in (1, 7):
        df = spark.createDataFrame(rows, SCHEMA).repartition(parts)
        r = tile_visit_cadence(df, ZOOM).collect()[0]
        assert (r.n_gaps, r.median_gap_us, r.min_gap_us, r.max_gap_us) == (
            3, 0, 0, 5_000_000,
        )
