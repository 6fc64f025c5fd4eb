"""bbox_join (polygon-overlay) tests: pair-set equality vs an O(n*m)
numpy brute force on random rectangles, edge-touch semantics, and the
dedup-free plan shape (no dropDuplicates / distinct anywhere)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from fairy_core_spark.spatial.ops import bbox_join


def _rand_rects(rng, n, id0=0):
    lat0 = rng.uniform(-60, 50, n)
    lon0 = rng.uniform(-170, 150, n)
    return [
        (int(id0 + i), float(lat0[i]), float(lat0[i] + rng.uniform(0.5, 12)),
         float(lon0[i]), float(lon0[i] + rng.uniform(0.5, 20)))
        for i in range(n)
    ]


SCHEMA_L = "l_id long, lat0 double, lat1 double, lon0 double, lon1 double"
SCHEMA_R = "r_id long, lat0 double, lat1 double, lon0 double, lon1 double"


def _brute(lrects, rrects):
    out = set()
    for li, la0, la1, lo0, lo1 in lrects:
        for ri, ra0, ra1, ro0, ro1 in rrects:
            if la0 <= ra1 and ra0 <= la1 and lo0 <= ro1 and ro0 <= lo1:
                out.add((li, ri))
    return out


def test_bbox_join_matches_bruteforce(spark):
    rng = np.random.default_rng(47)
    lrects = _rand_rects(rng, 300)
    rrects = _rand_rects(rng, 200, id0=1000)
    got = {
        (r.l_id, r.r_id)
        for r in bbox_join(
            spark.createDataFrame(lrects, SCHEMA_L),
            spark.createDataFrame(rrects, SCHEMA_R),
        ).collect()
    }
    exp = _brute(lrects, rrects)
    assert got == exp and len(exp) > 100  # non-trivial overlap density


def test_bbox_join_no_duplicates_without_distinct(spark):
    # one giant box overlapping one small box spans MANY grid cells: the
    # min-corner emission must still yield the pair exactly once
    l = spark.createDataFrame([(1, -50.0, 40.0, -160.0, 140.0)], SCHEMA_L)
    r = spark.createDataFrame([(2, -1.5, 2.5, -3.0, 4.0)], SCHEMA_R)
    rows = bbox_join(l, r).collect()
    assert [(x.l_id, x.r_id) for x in rows] == [(1, 2)]
    plan = bbox_join(l, r)._jdf.queryExecution().executedPlan().toString()
    assert "Deduplicate" not in plan and "Distinct" not in plan


def test_bbox_join_edge_touch_counts(spark):
    # closed-interval semantics: boxes sharing exactly one edge overlap
    l = spark.createDataFrame([(1, 0.0, 10.0, 0.0, 10.0)], SCHEMA_L)
    r = spark.createDataFrame(
        [(2, 10.0, 20.0, 0.0, 10.0), (3, 10.5, 20.0, 0.0, 10.0)], SCHEMA_R
    )
    got = {(x.l_id, x.r_id) for x in bbox_join(l, r).collect()}
    assert got == {(1, 2)}  # edge-touch in, strictly-apart out


def test_bbox_join_bin_size_invariance(spark):
    rng = np.random.default_rng(48)
    lrects = _rand_rects(rng, 120)
    rrects = _rand_rects(rng, 80, id0=500)
    ldf = spark.createDataFrame(lrects, SCHEMA_L)
    rdf = spark.createDataFrame(rrects, SCHEMA_R)
    base = {(r.l_id, r.r_id) for r in bbox_join(ldf, rdf, bin_deg=5.0).collect()}
    for s in (2.0, 13.0):
        assert {
            (r.l_id, r.r_id) for r in bbox_join(ldf, rdf, bin_deg=s).collect()
        } == base
