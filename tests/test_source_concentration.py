"""source_tile_concentration: brute-force parity, single-tile saturation
(max_share_permille == 1000), and partition invariance."""

from __future__ import annotations

import math

import numpy as np

from fairy_core_spark.spatial.ops import source_tile_concentration

SCHEMA = "doc_id long, source string, lat double, lon double"
ZOOM = 5


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


def _rand_rows(rng, n):
    srcs = ["crawlA", "crawlB", "cityC"]
    rows = []
    for i in range(n):
        s = srcs[int(rng.integers(0, 3))]
        if s == "cityC":  # concentrated source: one city + rare outliers
            lat = 48.8 + float(rng.uniform(-0.01, 0.01))
            lon = 2.35 + float(rng.uniform(-0.01, 0.01))
            if rng.integers(0, 20) == 0:
                lat, lon = float(rng.uniform(-60, 60)), float(rng.uniform(-170, 170))
        else:
            lat, lon = float(rng.uniform(-60, 60)), float(rng.uniform(-170, 170))
        rows.append((i, s, round(lat, 3), round(lon, 3)))
    return rows


def _brute(rows, zoom):
    per = {}
    for _i, s, lat, lon in rows:
        k = (s, *_tile(lat, lon, zoom))
        per[k] = per.get(k, 0) + 1
    out = {}
    for s in {r[1] for r in rows}:
        ns = [n for (src, _x, _y), n in per.items() if src == s]
        total = sum(ns)
        out[s] = (
            total,
            len(ns),
            sum(n * n for n in ns),
            max(ns),
            math.floor(max(ns) * 1000 / total),
        )
    return out


def test_matches_bruteforce(spark):
    rng = np.random.default_rng(173)
    rows = _rand_rows(rng, 600)
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        r.source: (r.n_points, r.n_tiles, r.hhi_num, r.max_tile_n, r.max_share_permille)
        for r in source_tile_concentration(df, ZOOM).collect()
    }
    want = _brute(rows, ZOOM)
    assert got == want
    # the planted concentrated source must read as concentrated
    assert got["cityC"][4] > 800 > got["crawlA"][4]


def test_single_tile_source_saturates(spark):
    rows = [(i, "one", 10.0, 10.0) for i in range(5)]
    df = spark.createDataFrame(rows, SCHEMA)
    r = source_tile_concentration(df, ZOOM).collect()[0]
    assert (r.n_points, r.n_tiles, r.hhi_num, r.max_share_permille) == (5, 1, 25, 1000)


def test_partition_invariant(spark):
    rng = np.random.default_rng(179)
    rows = _rand_rows(rng, 400)
    key = lambda recs: sorted(
        (r.source, r.n_points, r.n_tiles, r.hhi_num, r.max_tile_n, r.max_share_permille)
        for r in recs
    )
    a = key(
        source_tile_concentration(
            spark.createDataFrame(rows, SCHEMA).repartition(1), ZOOM
        ).collect()
    )
    b = key(
        source_tile_concentration(
            spark.createDataFrame(rows, SCHEMA).repartition(11), ZOOM
        ).collect()
    )
    assert a == b and a
