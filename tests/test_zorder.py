"""Z-order / geohash operator tests (SURVEY.md §2.6; north-rule cell
scheme #2). The engine's bit-spread Column math is checked against an
INDEPENDENT implementation of the published subdivision algorithm (the
classic per-bit range-halving loop below — a different algorithm, not a
refactor of the engine's magic-number path) plus the published geohash
test vector, so the check is non-circular.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fairy_core_spark.spatial.zorder import (
    GEOHASH_B32,
    cluster_by_zorder,
    geohash_col,
    morton_code,
    morton_decode,
    with_zorder,
)


def ref_geohash(lat: float, lon: float, precision: int) -> str:
    """Published algorithm, verbatim: alternate lon/lat range halving,
    emit 5 bits per base32 char (Niemeyer's geohash, public spec)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    out, bit, ch, even = [], 0, 0, True
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = ch * 2 + 1
                lon_lo = mid
            else:
                ch = ch * 2
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = ch * 2 + 1
                lat_lo = mid
            else:
                ch = ch * 2
                lat_hi = mid
        even = not even
        bit += 1
        if bit == 5:
            out.append(GEOHASH_B32[ch])
            bit, ch = 0, 0
    return "".join(out)


def ref_morton(lat: float, lon: float, bits: int = 30) -> int:
    """Per-bit interleave loop — independent of the magic-number spread."""
    u_lat = min(max(int(np.floor((lat + 90.0) / 180.0 * 2**bits)), 0), 2**bits - 1)
    u_lon = min(max(int(np.floor((lon + 180.0) / 360.0 * 2**bits)), 0), 2**bits - 1)
    z = 0
    for i in range(bits):
        z |= ((u_lat >> i) & 1) << (2 * i)
        z |= ((u_lon >> i) & 1) << (2 * i + 1)
    return z


def _run(spark, rows, cols="lat double, lon double"):
    return spark.createDataFrame(rows, cols)


def test_published_geohash_vectors(spark):
    # (57.64911, 10.40744) -> u4pruydqqvj is THE published example
    # (geohash.org / Wikipedia); ezs42 is the Wikipedia worked decode.
    df = _run(spark, [(57.64911, 10.40744), (42.605, -5.603)])
    got = [
        r[0]
        for r in df.select(geohash_col(F.col("lat"), F.col("lon"), 11)).collect()
    ]
    assert got[0] == "u4pruydqqvj"
    assert got[1][:5] == "ezs42"


def test_geohash_matches_reference_grid(spark):
    pts = [
        (float(la), float(lo))
        for la in np.linspace(-89.9, 89.9, 13)
        for lo in np.linspace(-179.9, 179.9, 17)
    ]
    df = _run(spark, pts)
    got = [
        r[0] for r in df.select(geohash_col(F.col("lat"), F.col("lon"), 9)).collect()
    ]
    exp = [ref_geohash(la, lo, 9) for la, lo in pts]
    assert got == exp


def test_morton_matches_reference_loop(spark):
    rng = np.random.default_rng(41)
    pts = [
        (float(la), float(lo))
        for la, lo in zip(rng.uniform(-90, 90, 200), rng.uniform(-180, 180, 200))
    ]
    df = _run(spark, pts)
    got = [r[0] for r in df.select(morton_code(F.col("lat"), F.col("lon"))).collect()]
    exp = [ref_morton(la, lo) for la, lo in pts]
    assert got == exp


def test_decode_roundtrip_within_cell(spark):
    rng = np.random.default_rng(42)
    pts = [
        (float(la), float(lo))
        for la, lo in zip(rng.uniform(-90, 90, 300), rng.uniform(-180, 180, 300))
    ]
    df = _run(spark, pts).withColumn("z", morton_code(F.col("lat"), F.col("lon")))
    dlat, dlon = morton_decode(F.col("z"))
    out = df.select("lat", "lon", dlat.alias("dlat"), dlon.alias("dlon")).collect()
    cell_lat = 180.0 / 2**30
    cell_lon = 360.0 / 2**30
    for r in out:
        assert abs(r.lat - r.dlat) <= cell_lat
        assert abs(r.lon - r.dlon) <= cell_lon


@settings(max_examples=60, deadline=None)
@given(
    lat=st.floats(min_value=-90, max_value=90, allow_nan=False),
    lon=st.floats(min_value=-180, max_value=180, allow_nan=False),
)
def test_hypothesis_geohash_prefix_property(lat, lon):
    from hypothesis import assume

    # The floor-quantizer and the exact subdivision loop can legitimately
    # disagree within ~2^-21 of a cell boundary (double rounding in
    # (v+off)/range*2^30); exact dyadic boundaries themselves are fine
    # (division by 360/180 is exact there). Keep the property meaningful
    # by assuming away the sub-ulp sliver, except exact integers.
    for v, off, rng_ in ((lat, 90.0, 180.0), (lon, 180.0, 360.0)):
        u = (v + off) / rng_ * 2**30
        if u == int(u):
            # integer u is only trustworthy when v IS that exact dyadic
            # boundary (e.g. -5e-324 absorbs to u=2^29 but sits below it)
            assume(v == -off + rng_ * u / 2**30)
        else:
            assume(1e-6 < u - int(u) < 1 - 1e-6)
    # geohash is hierarchical: precision-p code is a prefix of precision-12
    full = ref_geohash(lat, lon, 12)
    for p in (1, 4, 8):
        assert ref_geohash(lat, lon, p) == full[:p]
    # and the reference loop agrees with the reference morton bit-read
    z = ref_morton(lat, lon, 30)
    derived = "".join(GEOHASH_B32[(z >> (55 - 5 * k)) & 31] for k in range(12))
    assert derived == full


def test_bits_validation():
    with pytest.raises(ValueError):
        morton_code(F.lit(0.0), F.lit(0.0), bits=0)
    with pytest.raises(ValueError):
        geohash_col(F.lit(0.0), F.lit(0.0), precision=13)


def test_cluster_by_zorder_partitions_are_disjoint_z_ranges(spark):
    rng = np.random.default_rng(43)
    n = 20_000
    pts = [
        (int(i), float(la), float(lo))
        for i, (la, lo) in enumerate(
            zip(rng.uniform(-60, 60, n), rng.uniform(-170, 170, n))
        )
    ]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    clustered = cluster_by_zorder(df, n_partitions=8)  # keeps "zcode"
    ranges = (
        clustered.withColumn("z", F.col("zcode"))
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("z").alias("zmin"), F.max("z").alias("zmax"), F.count("*").alias("n"))
        .collect()
    )
    assert sum(r.n for r in ranges) == n
    assert len(ranges) >= 4  # range partitioner may merge tiny buckets
    spans = sorted((r.zmin, r.zmax) for r in ranges)
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo  # disjoint, ordered Z-ranges -> footer-stat pruning
    # balance: sampled range partitioning should not produce a giant bucket
    assert max(r.n for r in ranges) < 0.5 * n


def test_zranges_cover_exactly_the_bbox_cells(spark, tmp_path):
    from fairy_core_spark.spatial.zorder import zrange_filter, zranges_for_bbox

    rng = np.random.default_rng(44)
    n = 5000
    pts = [
        (int(i), float(la), float(lo))
        for i, (la, lo) in enumerate(
            zip(rng.uniform(-60, 60, n), rng.uniform(-170, 170, n))
        )
    ]
    # materialize the code column the way production would (stored column
    # -> pushdown-able predicates; inline codes would re-inline the bit
    # math per comparison, see zorder.py docstrings)
    spark.createDataFrame(pts, "id long, lat double, lon double").withColumn(
        "zcode", morton_code(F.col("lat"), F.col("lon"))
    ).write.parquet(str(tmp_path / "zpts"))
    df = spark.read.parquet(str(tmp_path / "zpts"))
    bbox = (10.0, 35.0, -40.0, 20.0)
    exact = df.where(
        (F.col("lat") >= bbox[0]) & (F.col("lat") <= bbox[1])
        & (F.col("lon") >= bbox[2]) & (F.col("lon") <= bbox[3])
    )
    pruned = df.where(zrange_filter(*bbox)).where(
        (F.col("lat") >= bbox[0]) & (F.col("lat") <= bbox[1])
        & (F.col("lon") >= bbox[2]) & (F.col("lon") <= bbox[3])
    )
    ids_exact = {r.id for r in exact.collect()}
    ids_pruned = {r.id for r in pruned.collect()}
    assert ids_exact == ids_pruned  # the Z-cover never drops a point
    # and the cover alone is a reasonable superset, not a full scan
    n_cover = df.where(zrange_filter(*bbox)).count()
    assert len(ids_exact) <= n_cover < n
    ranges = zranges_for_bbox(*bbox)
    assert 1 <= len(ranges) <= 64
    assert all(lo <= hi for lo, hi in ranges)
    assert all(b[0] > a[1] for a, b in zip(ranges, ranges[1:]))  # disjoint+sorted
    # the BETWEENs reach the parquet scan as pushed filters (data skipping)
    plan = (
        df.where(zrange_filter(*bbox))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # (the long Or-chain is truncated in toString, so match the head)
    assert "PushedFilters: [Or(" in plan or "PushedFilters: [And(" in plan


def test_zranges_single_point_and_validation():
    from fairy_core_spark.spatial.zorder import zranges_for_bbox

    r = zranges_for_bbox(12.34, 12.34, 56.78, 56.78)
    assert len(r) == 1 and r[0][0] == r[0][1] == ref_morton(12.34, 56.78)
    with pytest.raises(ValueError):
        zranges_for_bbox(5.0, 4.0, 0.0, 1.0)


def test_with_zorder_is_single_projection(spark):
    df = spark.range(100).select(
        (F.col("id") % 90 - 45).cast("double").alias("lat"),
        (F.col("id") % 180 - 90).cast("double").alias("lon"),
    )
    plan = with_zorder(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure native projection, no shuffle
    assert "Python" not in plan  # and no Python/Arrow eval anywhere


def _scan_output_rows(df) -> int:
    """Sum of numOutputRows over the executed plan's scan leaves — i.e. how
    many rows the parquet reader actually produced after row-group/page
    pruning (the filter node runs above the scan, so this measures the
    LAYOUT's data skipping, not the predicate)."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        plan = plan.executedPlan()
    leaves = plan.collectLeaves()
    total = 0
    for i in range(leaves.size()):
        m = leaves.apply(i).metrics()
        if m.contains("numOutputRows"):
            total += m.apply("numOutputRows").value()
    return total


def test_zorder_layout_prunes_rowgroups_at_the_scan(spark, tmp_path):
    """The data-skipping claim, proven at the scan metrics: the SAME bbox
    query over the SAME rows reads >=8x fewer rows from parquet when the
    table was laid out with cluster_by_zorder than with a random layout —
    i.e. footer min/max stats on the stored zcode column actually prune
    row groups, not just that the Z-ranges are disjoint."""
    from fairy_core_spark.spatial.zorder import zrange_filter

    n = 200_000
    pts = spark.range(n).select(
        F.col("id").alias("point_id"),
        (((F.col("id") * 7919) % 120000) / 1000.0 - 60.0).alias("lat"),
        (((F.col("id") * 104729) % 360000) / 1000.0 - 180.0).alias("lon"),
    )
    clustered_path = str(tmp_path / "clustered")
    random_path = str(tmp_path / "random")
    # small parquet row groups so pruning granularity is finer than whole
    # files (at real scale 128 MB row groups play the same role)
    cluster_by_zorder(pts, n_partitions=16).write.option(
        "parquet.block.size", 64 * 1024
    ).parquet(clustered_path)
    with_zorder(pts).repartition(16).write.option(
        "parquet.block.size", 64 * 1024
    ).parquet(random_path)

    # ~1.5% of the globe; exact predicate composed with the range cover
    bbox = (10.0, 25.0, 40.0, 55.0)
    lat0, lat1, lon0, lon1 = bbox

    def q(path):
        df = spark.read.parquet(path)
        return df.where(zrange_filter(*bbox)).where(
            F.col("lat").between(lat0, lat1) & F.col("lon").between(lon0, lon1)
        )

    # both layouts return the identical result set
    a = {r["point_id"] for r in q(clustered_path).collect()}
    b = {r["point_id"] for r in q(random_path).collect()}
    assert a == b and len(a) > 0

    read_clustered = _scan_output_rows(q(clustered_path))
    read_random = _scan_output_rows(q(random_path))
    assert read_clustered > 0
    assert read_random >= 8 * read_clustered, (
        f"clustered layout read {read_clustered} rows vs {read_random} random — "
        "expected >=8x row-group pruning from footer stats"
    )


def test_zranges_budget_is_a_hard_bound():
    """len(ranges) <= max_ranges for ANY bbox (the pop-time budget check
    used to allow overshoot to max_ranges+3 on fragmented boxes), and the
    cover stays a superset of the exact bbox codes."""
    from fairy_core_spark.spatial.zorder import zranges_for_bbox

    cases = [
        (-33.3, 41.7, -120.1, 63.9),
        (10.0, 10.0001, -179.9, 179.9),   # thin worldwide sliver: fragmented
        (-89.9, 89.9, 0.0, 0.1),          # thin vertical sliver
        (0.0, 0.0, 0.0, 0.0),
        (-90.0, 90.0, -180.0, 180.0),
    ]
    for budget in (1, 4, 7, 16, 64):
        for bbox in cases:
            ranges = zranges_for_bbox(*bbox, max_ranges=budget)
            assert 1 <= len(ranges) <= budget, (bbox, budget, len(ranges))
            # sorted + disjoint
            for (l0, h0), (l1, h1) in zip(ranges, ranges[1:]):
                assert h0 < l1


def test_polygon_covering_cells_chunked_matches_single_shot():
    """The lat-strip chunking is a memory bound, not a semantic change:
    identical cell set to a one-shot dense mesh."""
    import numpy as np

    from fairy_core_spark.functions import geometry
    from fairy_core_spark.spatial import s2

    ring = np.array([[10.0, 20.0], [12.5, 23.0], [14.0, 20.5], [10.0, 20.0]])
    got = geometry.polygon_covering_cells(ring, 8)

    step = np.degrees(s2.min_width_rad(8)) / 2.0
    lats = np.arange(10.0, 14.0 + step, step)
    lons = np.arange(20.0, 23.0 + step, step)
    glat, glon = np.meshgrid(lats, lons)
    cells = np.unique(s2.cell_id(glat.ravel(), np.clip(glon.ravel(), -180, 180), 8))
    want = np.unique(np.concatenate([cells, s2.neighbors(cells, 8).ravel()]))
    assert np.array_equal(got, want)
