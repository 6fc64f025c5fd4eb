"""hex7 aperture-7 icosahedral index tests (SURVEY.md §2.6 — the H3-class
sibling of S2). Published-vector parity with H3 proper is impossible
in-sandbox (H3 numbering depends on its 122-entry base-cell DATA table;
no table, no h3 lib — see spatial/hex7.py's module docstring), so these
tests pin the construction by its mathematical properties instead:
exactness of the lattice round trip, the coset/digit system, aperture-7
density growth, hierarchy bit math, and locality."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fairy_core_spark.spatial import hex7


def _sample(n=20000, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-89, 89, n), rng.uniform(-180, 180, n)


def test_icosahedron_from_first_principles():
    # 20 faces, unit centers, face centers pairwise distinct
    assert hex7._FACES.shape == (20, 3)
    assert np.allclose(np.linalg.norm(hex7._CENTERS, axis=1), 1.0)
    d = hex7._CENTERS @ hex7._CENTERS.T
    np.fill_diagonal(d, -1)
    assert d.max() < 0.99


def test_residue_table_is_a_coset_system():
    # rebuilt here so a table regression cannot hide: every remainder in
    # the rounding bound maps to exactly one (delta, digit) — asserted
    # inside the builder
    di, dj, dig, rng_ = hex7._build_residue_tables()
    assert (dig >= 0).all() and (dig <= 6).all()
    # digit of the zero remainder is 0 with zero correction
    assert dig[rng_, rng_] == 0 and di[rng_, rng_] == 0 and dj[rng_, rng_] == 0


@pytest.mark.parametrize("res", [0, 1, 3, 7, 14])
def test_roundtrip_exact_within_owning_face(res):
    """encode(center(cell)) == cell EXACTLY whenever the center lands on
    the owning face (the lattice math has no error); the only misses are
    face-edge-clipped cells whose nominal center falls across the seam —
    a fraction that shrinks ~sqrt(7)x per res."""
    lat, lon = _sample()
    c = hex7.cell_id(lat, lon, res)
    assert (c >= 0).all()
    assert (hex7.cell_res(c) == res).all()
    cla, clo = hex7.cell_center(c)
    c2 = hex7.cell_id(cla, clo, res)
    same_face = hex7._nearest_face(hex7._ll_to_xyz(cla, clo)) == ((c >> 54) & 0x1F)
    assert (c[same_face] == c2[same_face]).all()
    # and the seam fraction is small at working resolutions
    if res >= 5:
        assert (c == c2).mean() > 0.99


def test_aperture7_density_growth():
    """On a fixed single-face patch, distinct-cell count multiplies by ~7
    per resolution once the interior term dominates (the defining
    aperture-7 property)."""
    rng = np.random.default_rng(1)
    lat = rng.uniform(20, 25, 200000)
    lon = rng.uniform(20, 25, 200000)
    counts = [len(np.unique(hex7.cell_id(lat, lon, r))) for r in range(4, 8)]
    ratios = [counts[i + 1] / counts[i] for i in range(len(counts) - 1)]
    assert all(4.0 < r < 8.5 for r in ratios), (counts, ratios)


def test_digit_distribution_uniform():
    rng = np.random.default_rng(2)
    lat = rng.uniform(20, 25, 100000)
    lon = rng.uniform(20, 25, 100000)
    c = hex7.cell_id(lat, lon, 6)
    last = (c >> np.int64(39 - 3 * 5)) & 7
    freq = np.bincount(last, minlength=7) / len(last)
    assert freq.min() > 0.10 and freq.max() < 0.20  # 1/7 ~ 0.143


def test_parent_bit_math_matches_coarser_encode():
    """cell_to_parent is pure digit truncation; it equals encoding the
    same point at the coarser res except near parent-cell boundaries
    (the same caveat H3 documents for cellToParent vs latLngToCell)."""
    lat, lon = _sample()
    c7 = hex7.cell_id(lat, lon, 7)
    c6 = hex7.cell_id(lat, lon, 6)
    p = hex7.cell_to_parent(c7)
    assert (hex7.cell_res(p) == 6).all()
    assert (p == c6).mean() > 0.85
    # deep truncation composes: parent-of-parent == parent_res=5
    p5a = hex7.cell_to_parent(hex7.cell_to_parent(c7))
    p5b = hex7.cell_to_parent(c7, parent_res=5)
    assert (p5a == p5b).all()
    # parent center is near the child center (within the parent pitch)
    pla, plo = hex7.cell_center(p)
    cla, clo = hex7.cell_center(c7)
    on_same_face = ((p >> 54) & 0x1F) == ((c7 >> 54) & 0x1F)
    d = np.hypot(pla - cla, (plo - clo + 180) % 360 - 180)[on_same_face]
    assert np.quantile(d, 0.99) < 1.0  # res-6 pitch ~ 0.2 deg at s0=0.5


def test_locality_and_determinism():
    lat, lon = _sample()
    a = hex7.cell_id(lat, lon, 5)
    b = hex7.cell_id(lat + 1e-4, lon + 1e-4, 5)
    assert (a == b).mean() > 0.995
    assert (a == hex7.cell_id(lat, lon, 5)).all()
    one = hex7.cell_id(np.array([40.7]), np.array([-74.0]), 9)[0]
    assert one == hex7.cell_id(np.array([40.7, 0.0]), np.array([-74.0, 0.0]), 9)[0]


def test_res_validation():
    with pytest.raises(ValueError):
        hex7.cell_id(np.zeros(1), np.zeros(1), 15)
    with pytest.raises(ValueError):
        hex7.cell_id(np.zeros(1), np.zeros(1), -1)


def test_spark_udf_matches_numpy(spark):
    from fairy_core_spark.spatial.ops import with_cell

    pts = spark.range(3000).select(
        F.col("id").alias("point_id"),
        (((F.col("id") * 7919) % 120000) / 1000.0 - 60.0).alias("lat"),
        (((F.col("id") * 104729) % 360000) / 1000.0 - 180.0).alias("lon"),
    )
    got = {
        r["point_id"]: r["cell"]
        for r in with_cell(pts, level=5, scheme="hex7").collect()
    }
    ids = np.arange(3000)
    lat = ((ids * 7919) % 120000) / 1000.0 - 60.0
    lon = ((ids * 104729) % 360000) / 1000.0 - 180.0
    want = hex7.cell_id(lat, lon, 5)
    assert got == {int(i): int(w) for i, w in zip(ids, want)}


def test_unknown_scheme_rejected(spark):
    from fairy_core_spark.spatial.ops import with_cell

    df = spark.range(1).select(F.lit(0.0).alias("lat"), F.lit(0.0).alias("lon"))
    with pytest.raises(ValueError):
        with_cell(df, scheme="h4")


def test_north_pipeline_hex7_scheme(spark):
    """The flagship pipeline accepts cell_scheme='hex7': same validated
    image population, hexagonal tiles instead of S2 quadtree cells."""
    from fairy_core_spark.datagen.images import geo_df, images_df, polygons_pdf
    from fairy_core_spark.pipeline.north import north_pipeline

    images = images_df(spark, 600, partitions=4, dirty_every=100)
    geo = geo_df(spark, 600, partitions=4)
    s2_tiles = north_pipeline(images, geo, polygons_pdf(10), n_partitions=4).collect()
    hex_tiles = north_pipeline(
        images, geo, polygons_pdf(10), level=5, n_partitions=4, cell_scheme="hex7"
    ).collect()
    assert sum(r["n_images"] for r in hex_tiles) == sum(r["n_images"] for r in s2_tiles) > 0
    # hex ids carry the hex7 res field, s2 ids do not collide with them
    assert {(int(r["tile_id"]) >> 59) & 0xF for r in hex_tiles} == {5}


# --- grid API siblings: gridDisk / children / compact / uncompact -------


def test_cell_to_ij_roundtrip_every_res():
    lat, lon = _sample(5000, seed=3)
    for res in (0, 1, 4, 9, 14):
        c = hex7.cell_id(lat, lon, res)
        f, i, j, r = hex7.cell_to_ij(c)
        assert (r == res).all()
        assert np.array_equal(hex7.ij_to_cell(f, i, j, res), c)


def test_grid_disk_sizes_and_nesting():
    lat, lon = _sample(2000, seed=4)
    c = np.unique(hex7.cell_id(lat, lon, 5))
    d0 = hex7.grid_disk(c, 0)
    assert d0.shape == (len(c), 1) and np.array_equal(d0[:, 0], c)
    d1, d2 = hex7.grid_disk(c, 1), hex7.grid_disk(c, 2)
    assert d1.shape[1] == 7 and d2.shape[1] == 19  # 3k^2 + 3k + 1
    for r1, r2 in zip(d1[:100], d2[:100]):
        assert set(r1) <= set(r2)
    # disk members are real cells: center re-encodes to the same id away
    # from face boundaries (spot check on the first row's disk)
    cl, cn = hex7.cell_center(d1[0])
    again = hex7.cell_id(cl, cn, 5)
    assert (again == d1[0]).mean() >= 5 / 7


def test_grid_disk_is_hex_distance_ball():
    # every disk(1) member is reachable by one axial unit step
    c = hex7.cell_id(np.array([12.0]), np.array([34.0]), 6)
    f, i, j, _ = hex7.cell_to_ij(hex7.grid_disk(c, 1).ravel())
    f0, i0, j0, _ = hex7.cell_to_ij(c)
    di, dj = i - i0[0], j - j0[0]
    assert set(zip(di.tolist(), dj.tolist())) == set(
        [(0, 0), (1, 0), (0, 1), (-1, 1), (-1, 0), (0, -1), (1, -1)]
    )


def test_children_parent_inverse():
    lat, lon = _sample(1000, seed=5)
    c = np.unique(hex7.cell_id(lat, lon, 6))
    ch = hex7.cell_to_children(c)
    assert ch.shape == (len(c), 7)
    assert (hex7.cell_res(ch.ravel()) == 7).all()
    assert np.array_equal(np.unique(hex7.cell_to_parent(ch.ravel())), c)
    # digits of the 7 children are 0..6 exactly
    assert np.array_equal(np.sort(ch[0] & (7 << (39 - 3 * 6))), ch[0] & (7 << (39 - 3 * 6)))


def test_compact_uncompact_roundtrip():
    lat, lon = _sample(500, seed=6)
    base = np.unique(hex7.cell_id(lat, lon, 4))[:40]
    exp = hex7.uncompact_cells(base, 6)
    assert len(exp) == 40 * 49
    assert np.array_equal(hex7.compact_cells(exp), np.sort(base))
    # dropping one leaf blocks exactly that subtree's compaction
    partial = hex7.compact_cells(exp[1:])
    assert len(partial) > len(base)
    assert np.array_equal(hex7.uncompact_cells(partial, 6), np.sort(exp[1:]))


def test_parent_containment_rate():
    # hex hierarchies are not perfectly nested (a hexagon cannot tile a
    # hexagon) — like H3, direct encode at the parent res agrees with
    # cell_to_parent for the overwhelming majority of points, not all
    lat, lon = _sample(20000, seed=7)
    fine = hex7.cell_id(lat, lon, 8)
    agree = hex7.cell_to_parent(fine, 5) == hex7.cell_id(lat, lon, 5)
    assert agree.mean() > 0.85


def test_polyfill_centers_subset_of_cover_and_cover_complete():
    ring = np.array(
        [[10.0, 20.0], [10.0, 50.0], [30.0, 50.0], [30.0, 20.0], [10.0, 20.0]]
    )
    cov = hex7.polyfill(ring, 3, mode="cover")
    cen = hex7.polyfill(ring, 3, mode="centers")
    assert 0 < len(cen) < len(cov)
    assert set(cen) <= set(cov)
    rng = np.random.default_rng(8)
    pl = rng.uniform(10.001, 29.999, 50000)
    pn = rng.uniform(20.001, 49.999, 50000)
    assert np.isin(hex7.cell_id(pl, pn, 3), cov).all()
    with pytest.raises(ValueError):
        hex7.polyfill(ring, 3, mode="bogus")


def test_spark_parent_children_bitmath_parity(spark):
    from fairy_core_spark.spatial.hex7_ops import (
        explode_children,
        hex7_parent_col,
        hex7_res_col,
    )

    lat, lon = _sample(3000, seed=9)
    cells = np.unique(hex7.cell_id(lat, lon, 6))
    df = spark.createDataFrame([(int(c),) for c in cells], "cell long")
    got = (
        df.select(
            hex7_parent_col(F.col("cell"), 3).alias("p"),
            hex7_res_col(F.col("cell")).alias("r"),
        )
        .toPandas()
    )
    assert (got["r"] == 6).all()
    assert np.array_equal(np.sort(got["p"].unique()), np.unique(hex7.cell_to_parent(cells, 3)))

    ch = explode_children(df, "cell", out="child").select("child").toPandas()["child"]
    assert np.array_equal(np.sort(ch.to_numpy()), np.sort(hex7.cell_to_children(cells).ravel()))


def test_spark_compact_uncompact_distributed(spark):
    from fairy_core_spark.spatial.hex7_ops import compact_cells_df, uncompact_cells_df

    lat, lon = _sample(400, seed=10)
    base = np.unique(hex7.cell_id(lat, lon, 4))[:25]
    exp = hex7.uncompact_cells(base, 6)
    # drop one leaf so the result is mixed-res
    df = spark.createDataFrame([(int(c),) for c in exp[1:]], "cell long")
    got = np.sort(compact_cells_df(df, "cell").toPandas()["cell"].to_numpy())
    assert np.array_equal(got, hex7.compact_cells(exp[1:]))
    back = np.sort(uncompact_cells_df(
        spark.createDataFrame([(int(c),) for c in got], "cell long"), "cell", 6
    ).toPandas()["cell"].to_numpy())
    assert np.array_equal(back, np.sort(exp[1:]))


def test_spatial_join_cells_hex7_scheme_equals_s2(spark):
    from fairy_core_spark.datagen.images import geo_df, polygons_pdf
    from fairy_core_spark.spatial.ops import spatial_join_cells

    pts = geo_df(spark, 800, partitions=4).withColumnRenamed("image_id", "pid")
    polys = polygons_pdf(8)
    a = spatial_join_cells(pts, polys, id_col="pid", level=8, scheme="s2")
    b = spatial_join_cells(pts, polys, id_col="pid", level=3, scheme="hex7")
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) > 0
    with pytest.raises(ValueError):
        spatial_join_cells(pts, polys, id_col="pid", scheme="h4")


def test_grid_disk_center_first_ring_next():
    c = hex7.cell_id(np.array([12.0, -40.0]), np.array([34.0, 150.0]), 6)
    d2 = hex7.grid_disk(c, 2)
    assert np.array_equal(d2[:, 0], c)
    assert np.array_equal(np.sort(d2[:, :7]), np.sort(hex7.grid_disk(c, 1)))


def test_cell_to_boundary_tiles_the_plane():
    from fairy_core_spark.functions.geometry import point_in_ring

    rng = np.random.default_rng(11)
    lat = rng.uniform(-80, 80, 500)
    lon = rng.uniform(-180, 180, 500)
    cells = hex7.cell_id(lat, lon, 5)
    bl, bn = hex7.cell_to_boundary(cells)
    assert bl.shape == (500, 6)
    # points lie inside their own cell's boundary hexagon (tolerating the
    # rare flip where gnomonic curvature moves a ray-cast edge crossing)
    inside = 0
    for k in range(200):
        ring = np.column_stack([np.append(bl[k], bl[k, 0]), np.append(bn[k], bn[k, 0])])
        inside += bool(point_in_ring(np.array([lat[k]]), np.array([lon[k]]), ring)[0])
    assert inside >= 198
    # boundaries tile: every immediate neighbor shares exactly 2 corners
    center = np.unique(cells)[:10]
    disk = hex7.grid_disk(center, 1)
    cl, cn = hex7.cell_to_boundary(disk.ravel())
    cl, cn = cl.reshape(10, 7, 6), cn.reshape(10, 7, 6)
    for g in range(10):
        for nb in range(1, 7):
            shared = sum(
                1
                for a in range(6)
                for b in range(6)
                if abs(cl[g, 0, a] - cl[g, nb, b]) < 1e-9
                and abs(cn[g, 0, a] - cn[g, nb, b]) < 1e-9
            )
            assert shared == 2, (g, nb, shared)


# --- data skipping: descendant ranges + clustered layout -----------------


def test_descendant_range_is_exactly_the_descendant_set():
    from fairy_core_spark.spatial.hex7_ops import hex7_descendant_range

    rng = np.random.default_rng(12)
    lat, lon = rng.uniform(-80, 80, 200), rng.uniform(-180, 180, 200)
    parents = np.unique(hex7.cell_id(lat, lon, 3))[:20]
    universe = hex7.cell_id(
        rng.uniform(-85, 85, 50000), rng.uniform(-180, 180, 50000), 5
    )
    for p in parents:
        lo, hi = hex7_descendant_range(int(p), 5)
        desc = set(hex7.uncompact_cells(np.array([p]), 5).tolist())
        in_range = {int(c) for c in universe if lo <= int(c) <= hi}
        assert in_range <= desc  # nothing foreign ever falls in the range
        # and every enumerated descendant is inside it
        assert all(lo <= d <= hi for d in desc)
    # sibling ranges are numerically adjacent (so the filter merges a full
    # set into ONE range) and their union covers exactly the parent's
    # descendants: the parent range is wider only by the digit-7 tail,
    # which no valid id ever occupies (digits are the 7 cosets 0..6)
    p = int(parents[0])
    kids = hex7.cell_to_children(np.array([p])).ravel()
    ranges = sorted(hex7_descendant_range(int(k), 5) for k in kids)
    assert all(ranges[i][1] + 1 == ranges[i + 1][0] for i in range(6))
    plo, phi = hex7_descendant_range(p, 5)
    assert ranges[0][0] == plo and ranges[-1][1] < phi
    desc = hex7.uncompact_cells(np.array([p]), 5)
    assert all(ranges[0][0] <= int(d) <= ranges[-1][1] for d in desc)


def test_hex7_layout_prunes_rowgroups_at_the_scan(spark, tmp_path):
    """Hex-hierarchical data skipping, proven at the scan metrics: the
    same polyfill-region query reads >=8x fewer rows from parquet on a
    cluster_by_hex7 layout than on a random layout (footer min/max on the
    stored cell column prunes row groups)."""
    from fairy_core_spark.spatial.hex7_ops import cluster_by_hex7, hex7_range_filter
    from tests.test_zorder import _scan_output_rows

    n = 200_000
    pts = spark.range(n).select(
        F.col("id").alias("point_id"),
        (((F.col("id") * 7919) % 120000) / 1000.0 - 60.0).alias("lat"),
        (((F.col("id") * 104729) % 360000) / 1000.0 - 180.0).alias("lon"),
    )
    clustered, random_ = str(tmp_path / "c"), str(tmp_path / "r")
    cluster_by_hex7(pts, res=6, n_partitions=16).write.option(
        "parquet.block.size", 64 * 1024
    ).parquet(clustered)
    from fairy_core_spark.spatial.ops import with_cell

    with_cell(pts, level=6, out="hcell", scheme="hex7").repartition(16).write.option(
        "parquet.block.size", 64 * 1024
    ).parquet(random_)

    # region = hex7 cover of a bbox (~1.5% of the globe) at parent res 3
    ring = np.array(
        [[10.0, 40.0], [10.0, 55.0], [25.0, 55.0], [25.0, 40.0], [10.0, 40.0]]
    )
    parents = hex7.polyfill(ring, 3, mode="cover")
    pred = hex7_range_filter(parents, res=6)

    def q(path):
        df = spark.read.parquet(path)
        return df.where(pred).where(
            F.col("lat").between(10.0, 25.0) & F.col("lon").between(40.0, 55.0)
        )

    a = {r["point_id"] for r in q(clustered).collect()}
    b = {r["point_id"] for r in q(random_).collect()}
    assert a == b and len(a) > 0
    read_c, read_r = _scan_output_rows(q(clustered)), _scan_output_rows(q(random_))
    assert read_c > 0
    assert read_r >= 8 * read_c, (read_c, read_r)


def test_hex7_range_filter_merges_and_caps():
    from fairy_core_spark.spatial.hex7_ops import hex7_range_filter

    lat = np.linspace(-60, 60, 300)
    lon = np.linspace(-150, 150, 300)
    parents = np.unique(hex7.cell_id(lat, lon, 4))
    with pytest.raises(ValueError):
        hex7_range_filter(parents, res=8, max_ranges=4)
    with pytest.raises(ValueError):
        hex7_range_filter([], res=8)
    # full sibling sets collapse: 7 children -> same predicate as 1 parent
    p = int(parents[0])
    kids = hex7.cell_to_children(np.array([p])).ravel().tolist()
    # full sibling sets collapse: 7 children merge into a single BETWEEN
    hex7_range_filter(kids, res=8, max_ranges=1)  # must not raise


# --- geometric (face-stitching) neighbors --------------------------------


def test_neighbors_geo_equals_lattice_ring_in_interior():
    rng = np.random.default_rng(13)
    lat, lon = rng.uniform(-70, 70, 3000), rng.uniform(-180, 180, 3000)
    c = np.unique(hex7.cell_id(lat, lon, 6))
    ng = hex7.neighbors_geo(c)
    ring1 = hex7.grid_disk(c, 1)[:, 1:]
    same = np.array([set(a) == set(b) for a, b in zip(ng, ring1)])
    # the non-equal tail is exactly the face-boundary cells
    assert same.mean() > 0.97


def _face_edge_midpoint():
    d = hex7._CENTERS @ hex7._CENTERS[0]
    adj = int(np.argsort(d)[-2])
    mid = hex7._CENTERS[0] + hex7._CENTERS[adj]
    mid /= np.linalg.norm(mid)
    mlat, mlon = hex7._xyz_to_ll(mid[None, :])
    return float(mlat[0]), float(mlon[0])


def test_neighbors_geo_stitches_across_faces():
    mlat, mlon = _face_edge_midpoint()
    rng = np.random.default_rng(14)
    box = hex7.cell_id(
        rng.uniform(mlat - 3, mlat + 3, 5000), rng.uniform(mlon - 3, mlon + 3, 5000), 6
    )
    bc = np.unique(box)
    assert len({(int(c) >> 54) & 0x1F for c in bc}) >= 2  # box straddles faces
    ngb = hex7.neighbors_geo(bc)
    crossers = sum(
        1
        for row, f in zip(ngb, (bc >> 54) & 0x1F)
        if any(((int(x) >> 54) & 0x1F) != f for x in row)
    )
    assert crossers > 0
    # disk_geo grows past the same-face clip
    dg = hex7.disk_geo(bc, 2)
    assert len(dg) > len(bc)
    assert len({(int(c) >> 54) & 0x1F for c in dg}) >= 2


def test_polyfill_cover_complete_across_face_boundary():
    """The round-4 cover pad (lattice disk UNION geometric disk) closes
    face-boundary sliver holes: a rect straddling an icosahedron edge
    covers every one of 200k dense interior points."""
    mlat, mlon = _face_edge_midpoint()
    ring = np.array(
        [
            [mlat - 2.5, mlon - 2.5],
            [mlat - 2.5, mlon + 2.5],
            [mlat + 2.5, mlon + 2.5],
            [mlat + 2.5, mlon - 2.5],
            [mlat - 2.5, mlon - 2.5],
        ]
    )
    cov = hex7.polyfill(ring, 5, mode="cover")
    rng = np.random.default_rng(15)
    pl = rng.uniform(mlat - 2.499, mlat + 2.499, 200000)
    pn = rng.uniform(mlon - 2.499, mlon + 2.499, 200000)
    assert np.isin(hex7.cell_id(pl, pn, 5), cov).all()


def test_explode_children_rejects_max_res(spark):
    from fairy_core_spark.spatial.hex7_ops import explode_children

    c = int(hex7.cell_id(np.array([10.0]), np.array([20.0]), 14)[0])
    df = spark.createDataFrame([(c,)], "cell long")
    with pytest.raises(Exception, match="MAX_RES"):
        explode_children(df, "cell").collect()


def test_spark_pyramid_one_expand(spark):
    """hex7_pyramid == the per-level parent groupBys, via ONE Expand."""
    from fairy_core_spark.spatial.hex7_ops import hex7_parent_col, hex7_pyramid

    lat, lon = _sample(2000, seed=11)
    cells = hex7.cell_id(lat, lon, 5)
    df = spark.createDataFrame(
        [(int(c), i) for i, c in enumerate(cells)], "cell long, v long"
    )
    got = (
        hex7_pyramid(df, cell_col="cell", levels=(5, 3, 1))
        .groupBy("res", "cell")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .toPandas()
        .sort_values(["res", "cell"])
        .reset_index(drop=True)
    )
    # reference: one groupBy per level on the numpy parent math
    import pandas as pd

    ref_rows = []
    for lvl in (5, 3, 1):
        p = cells if lvl == 5 else hex7.cell_to_parent(cells, lvl)
        pdf = pd.DataFrame({"cell": p.astype(np.int64), "v": np.arange(len(p))})
        g = pdf.groupby("cell").agg(n=("v", "size"), s=("v", "sum")).reset_index()
        g.insert(0, "res", lvl)
        ref_rows.append(g)
    ref = (
        pd.concat(ref_rows)
        .sort_values(["res", "cell"])
        .reset_index(drop=True)
        .astype({"res": got["res"].dtype, "n": got["n"].dtype, "s": got["s"].dtype})
    )
    pd.testing.assert_frame_equal(got, ref)

    # the whole pyramid is ONE codegen Generate(stack) — no Union of scans
    plan = (
        hex7_pyramid(df, cell_col="cell", levels=(5, 3, 1))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Generate stack") == 1 and "Union" not in plan
    assert plan.lstrip().startswith("*")  # Generate runs inside WholeStageCodegen

    with pytest.raises(ValueError):
        hex7_pyramid(df, levels=(99,))


def test_compact_tolerates_parent_alongside_children(spark):
    """input holding a cell AND its full child set (invalid per H3's
    contract) must still converge to the minimal set with no duplicate
    rows — the produced parent deduplicates against the pre-existing one
    and the next level's ==7 sibling count stays correct."""
    from fairy_core_spark.spatial.hex7_ops import compact_cells_df

    g = int(hex7.cell_id(np.array([10.0]), np.array([20.0]), 1)[0])
    sibs = hex7.cell_to_children(np.array([g], dtype=np.int64)).ravel()  # 7 res-2 cells
    kids0 = hex7.cell_to_children(sibs[:1]).ravel()  # res-3 children of sibs[0]
    # numpy twin: sibs[0] present both directly and via its children
    mixed = np.concatenate([sibs, kids0])
    got = hex7.compact_cells(mixed)
    assert np.array_equal(got, np.array([g], dtype=np.int64))

    df = spark.createDataFrame([(int(c),) for c in mixed], "cell long")
    rows = np.sort(compact_cells_df(df, "cell").toPandas()["cell"].to_numpy())
    assert np.array_equal(rows, np.array([g], dtype=np.int64))


def test_grid_distance_matches_disk_rings():
    # distance k <=> first appears in grid_disk(a, k): checked for a
    # batch of random interior cells against their k<=4 disks
    lat, lon = _sample(40, seed=11)
    cells = hex7.cell_id(lat, lon, 6)
    for a in cells[:10]:
        disk = hex7.grid_disk(np.array([a]), 4)[0]
        d = hex7.grid_distance(np.full(disk.shape, a), disk)
        # ring sizes 1, 6, 12, 18, 24 in disk order (sorted by distance)
        sizes = [np.sum(d == k) for k in range(5)]
        assert sizes == [1, 6, 12, 18, 24]
        # disk ordering is (hex distance, offset): distances nondecreasing
        assert (np.diff(d) >= 0).all()


def test_grid_distance_symmetry_and_triangle():
    lat, lon = _sample(300, seed=12)
    cells = hex7.cell_id(lat, lon, 5)
    # keep one face so pairs are same-face lattice points
    face = (cells >> np.int64(54)) & np.int64(31)
    fc = cells[face == np.bincount(face.astype(int)).argmax()]
    a, b, c = fc[:-2], fc[1:-1], fc[2:]
    dab = hex7.grid_distance(a, b)
    assert np.array_equal(dab, hex7.grid_distance(b, a))
    assert (hex7.grid_distance(a, c) <= dab + hex7.grid_distance(b, c)).all()
    assert (hex7.grid_distance(a, a) == 0).all()


def test_grid_distance_rejects_cross_face_and_mixed_res():
    lat = np.array([10.0, -70.0])
    lon = np.array([20.0, 150.0])
    cells = hex7.cell_id(lat, lon, 5)
    face = (cells >> np.int64(54)) & np.int64(31)
    assert face[0] != face[1]
    with pytest.raises(ValueError, match="same-face"):
        hex7.grid_distance(cells[:1], cells[1:])
    mixed = hex7.cell_id(lat[:1], lon[:1], 6)
    with pytest.raises(ValueError, match="one resolution"):
        hex7.grid_distance(cells[:1], mixed)


def test_grid_path_cells_line_properties():
    # endpoints exact, length = distance+1, consecutive cells adjacent,
    # all distinct — the hex line-drawing contract, for many random
    # same-face pairs at several resolutions
    rng = np.random.default_rng(13)
    for res in (4, 6):
        lat, lon = _sample(200, seed=res)
        cells = hex7.cell_id(lat, lon, res)
        face = (cells >> np.int64(54)) & np.int64(31)
        fc = cells[face == np.bincount(face.astype(int)).argmax()]
        pairs = rng.choice(fc, size=(25, 2))
        for a, b in pairs:
            path = hex7.grid_path_cells(int(a), int(b))
            d = int(hex7.grid_distance(np.array([a]), np.array([b]))[0])
            assert path[0] == a and path[-1] == b
            assert path.shape == (d + 1,)
            assert len(set(path.tolist())) == d + 1
            if d:
                steps = hex7.grid_distance(path[:-1], path[1:])
                assert (steps == 1).all()


def test_grid_path_cells_trivial_and_deterministic():
    lat, lon = _sample(2, seed=14)
    a = int(hex7.cell_id(lat[:1], lon[:1], 6)[0])
    assert hex7.grid_path_cells(a, a).tolist() == [a]
    b_arr = hex7.grid_disk(np.array([a]), 3)[0]
    b = int(b_arr[-1])
    assert hex7.grid_path_cells(a, b).tolist() == hex7.grid_path_cells(a, b).tolist()
    # reversal gives a (possibly different) valid line between the same
    # endpoints with the same length
    fwd, rev = hex7.grid_path_cells(a, b), hex7.grid_path_cells(b, a)
    assert fwd.shape == rev.shape and rev[0] == b and rev[-1] == a
