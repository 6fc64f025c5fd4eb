"""Hilbert-curve tile encoding (spatial/hilbert.py): base-case vectors,
bijection + the adjacency property Z-order lacks, inverse roundtrip,
DuckDB recursive-CTE twin parity, and the Spark Arrow projection."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from fairy_core_spark.spatial.hilbert import (
    d2xy,
    hilbert_recursive_sql,
    with_hilbert,
    xy2d,
)


def test_order1_base_case():
    """The U-shaped order-1 curve: (0,0)->0 (0,1)->1 (1,1)->2 (1,0)->3."""
    got = xy2d(np.array([0, 0, 1, 1]), np.array([0, 1, 1, 0]), 1)
    assert got.tolist() == [0, 1, 2, 3]


def test_bijection_and_adjacency_full_grid():
    """Over the FULL 2^o x 2^o grid: d is a bijection onto [0, 4^o) and
    consecutive curve positions are grid-adjacent (|dx|+|dy| == 1) —
    the locality guarantee Z-order famously lacks at seam crossings."""
    for o in (2, 4, 5):
        n = 1 << o
        gx, gy = np.meshgrid(np.arange(n), np.arange(n))
        d = xy2d(gx.ravel(), gy.ravel(), o)
        assert sorted(d.tolist()) == list(range(n * n))
        ix, iy = d2xy(np.arange(n * n), o)
        assert (xy2d(ix, iy, o) == np.arange(n * n)).all()
        steps = np.abs(np.diff(ix)) + np.abs(np.diff(iy))
        assert (steps == 1).all()


def test_zorder_seam_contrast():
    """Quantified contrast on the 16x16 grid: every Hilbert step is 1;
    Morton (bit-interleave) steps include seam jumps > 1."""
    o, n = 4, 16
    ix, iy = d2xy(np.arange(n * n), o)
    assert int(np.max(np.abs(np.diff(ix)) + np.abs(np.diff(iy)))) == 1
    # morton order walk of the same grid
    gx, gy = np.meshgrid(np.arange(n), np.arange(n))
    fx, fy = gx.ravel(), gy.ravel()

    def spread(v):
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        return (v | (v << 1)) & 0x55555555

    m = (spread(fx.astype(np.int64)) << 1) | spread(fy.astype(np.int64))
    order = np.argsort(m)
    zsteps = np.abs(np.diff(fx[order])) + np.abs(np.diff(fy[order]))
    assert int(zsteps.max()) > 1  # the Z seam


def test_out_of_range_and_bad_order():
    with pytest.raises(ValueError, match="grid"):
        xy2d(np.array([4]), np.array([0]), 2)
    with pytest.raises(ValueError, match="order"):
        xy2d(np.array([0]), np.array([0]), 0)
    with pytest.raises(ValueError, match="order"):
        d2xy(np.array([0]), 32)


def test_duckdb_recursive_twin_parity():
    """The oracle building block reproduces xy2d exactly on random
    coords at a deep order."""
    rng = np.random.default_rng(17)
    o, m = 12, 400
    xs = rng.integers(0, 1 << o, m)
    ys = rng.integers(0, 1 << o, m)
    want = xy2d(xs, ys, o)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts (i BIGINT, x BIGINT, y BIGINT)")
    con.executemany(
        "INSERT INTO pts VALUES (?,?,?)",
        [(int(i), int(a), int(b)) for i, (a, b) in enumerate(zip(xs, ys))],
    )
    sql = (
        f"WITH RECURSIVE {hilbert_recursive_sql(o, 'pts', 'i')} "
        "SELECT i, d FROM hilbert_done ORDER BY i"
    )
    got = dict(con.execute(sql).fetchall())
    assert all(got[i] == int(want[i]) for i in range(m))


def test_spark_projection_matches_numpy(spark):
    """The Arrow pandas_udf == the numpy twin, and cluster_by_hilbert
    sorts each partition by the curve."""
    from fairy_core_spark.spatial.hilbert import cluster_by_hilbert

    rng = np.random.default_rng(23)
    o, m = 9, 300
    xs = rng.integers(0, 1 << o, m)
    ys = rng.integers(0, 1 << o, m)
    df = spark.createDataFrame(
        [(int(i), int(a), int(b)) for i, (a, b) in enumerate(zip(xs, ys))],
        "i long, tile_x long, tile_y long",
    )
    got = {
        r["i"]: r["hilbert"] for r in with_hilbert(df, order=o).collect()
    }
    want = xy2d(xs, ys, o)
    assert all(got[i] == int(want[i]) for i in range(m))

    pts = [
        (int(i), float(la), float(lo))
        for i, (la, lo) in enumerate(
            zip(rng.uniform(-80, 80, 200), rng.uniform(-179, 179, 200))
        )
    ]
    pdf = spark.createDataFrame(pts, "i long, lat double, lon double")
    clustered = cluster_by_hilbert(pdf, zoom=8, n_partitions=4)
    rows = clustered.select(F.spark_partition_id().alias("p"), "hilbert").collect()
    by_part: dict[int, list[int]] = {}
    for r in rows:
        by_part.setdefault(r["p"], []).append(r["hilbert"])
    for vals in by_part.values():
        assert vals == sorted(vals)
    # range partitioning: partitions cover disjoint curve ranges
    spans = sorted((min(v), max(v)) for v in by_part.values())
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2


def test_hilbert_ranges_exact_and_capped():
    """Unbounded descent gives the EXACT curve cover of a bbox; the
    capped form is a superset and respects max_ranges exactly."""
    from fairy_core_spark.spatial.hilbert import hilbert_ranges_for_bbox

    rng = np.random.default_rng(41)
    o, n = 6, 64
    gx, gy = np.meshgrid(np.arange(n), np.arange(n))
    fx, fy = gx.ravel(), gy.ravel()
    dall = xy2d(fx, fy, o)
    for _ in range(60):
        x0, x1 = sorted(int(v) for v in rng.integers(0, n, 2))
        y0, y1 = sorted(int(v) for v in rng.integers(0, n, 2))
        inside = (fx >= x0) & (fx <= x1) & (fy >= y0) & (fy <= y1)
        exact = hilbert_ranges_for_bbox(x0, x1, y0, y1, o, max_ranges=10**9)
        member = np.zeros(n * n, bool)
        for lo, hi in exact:
            member |= (dall >= lo) & (dall <= hi)
        assert (member == inside).all()
        capped = hilbert_ranges_for_bbox(x0, x1, y0, y1, o, max_ranges=6)
        assert len(capped) <= 6
        member_c = np.zeros(n * n, bool)
        for lo, hi in capped:
            member_c |= (dall >= lo) & (dall <= hi)
        assert (member_c | ~inside).all()  # conservative
    with pytest.raises(ValueError, match="bbox"):
        hilbert_ranges_for_bbox(5, 4, 0, 0, 6)


def test_hilbert_fewer_fragments_than_zorder():
    """The locality claim, quantified: over a battery of random bboxes on
    the same tile grid, the Hilbert curve cover needs FEWER total
    fragments than the Morton cover (runs of consecutive codes inside
    the box)."""
    from fairy_core_spark.spatial.hilbert import hilbert_ranges_for_bbox

    def spread(v):
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        return (v | (v << 1)) & 0x55555555

    rng = np.random.default_rng(43)
    o, n = 6, 64
    gx, gy = np.meshgrid(np.arange(n), np.arange(n))
    fx, fy = gx.ravel(), gy.ravel()
    morton = (spread(fx.astype(np.int64)) << 1) | spread(fy.astype(np.int64))
    h_total = z_total = 0
    for _ in range(100):
        x0, x1 = sorted(int(v) for v in rng.integers(0, n, 2))
        y0, y1 = sorted(int(v) for v in rng.integers(0, n, 2))
        inside = (fx >= x0) & (fx <= x1) & (fy >= y0) & (fy <= y1)
        h_total += len(hilbert_ranges_for_bbox(x0, x1, y0, y1, o, max_ranges=10**9))
        zc = np.sort(morton[inside])
        z_total += 1 + int(np.count_nonzero(np.diff(zc) > 1))
    assert h_total < z_total, (h_total, z_total)


def test_hilbert_range_filter_predicate(spark):
    """The OR-of-BETWEENs predicate keeps exactly the bbox tiles on a
    stored-hilbert frame (exact descent) and is conservative when
    capped."""
    from fairy_core_spark.spatial.hilbert import hilbert_range_filter

    o, n = 5, 32
    gx, gy = np.meshgrid(np.arange(n), np.arange(n))
    fx, fy = gx.ravel(), gy.ravel()
    d = xy2d(fx, fy, o)
    df = spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in zip(fx, fy, d)],
        "tile_x long, tile_y long, hilbert long",
    )
    kept = df.where(hilbert_range_filter(4, 11, 7, 20, o, max_ranges=10**9))
    got = {(r["tile_x"], r["tile_y"]) for r in kept.collect()}
    want = {(x, y) for x, y in zip(fx, fy) if 4 <= x <= 11 and 7 <= y <= 20}
    assert got == want
    capped = df.where(hilbert_range_filter(4, 11, 7, 20, o, max_ranges=3))
    got_c = {(r["tile_x"], r["tile_y"]) for r in capped.collect()}
    assert want <= got_c
