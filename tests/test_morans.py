"""Global Moran's I tests: exact integer moments vs a numpy brute force
over random occupied grids, sign sanity on planted clustered vs
checkerboard layouts, and degenerate-input behavior."""

from __future__ import annotations

import numpy as np
import pytest

from fairy_core_spark.spatial.ops import morans_i

SCHEMA = "tile_x long, tile_y long"


def _brute(points):
    counts: dict[tuple, int] = {}
    for xy in points:
        counts[xy] = counts.get(xy, 0) + 1
    cells = list(counts)
    n = len(cells)
    total = sum(counts.values())
    d = {c: n * counts[c] - total for c in cells}
    occ = set(cells)
    num = w = 0
    for (cx, cy) in cells:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) == (0, 0):
                    continue
                nb = (cx + dx, cy + dy)
                if nb in occ:
                    w += 1
                    num += d[(cx, cy)] * d[nb]
    den = sum(v * v for v in d.values())
    return n, total, w, num, den


def test_matches_bruteforce_on_random_grid(spark):
    rng = np.random.default_rng(31)
    pts = [(int(rng.integers(0, 12)), int(rng.integers(0, 12))) for _ in range(600)]
    row = morans_i(spark.createDataFrame(pts, SCHEMA)).collect()[0]
    n, total, w, num, den = _brute(pts)
    assert (row.n_cells, row.total, row.w_pairs, row.num, row.den) == (
        n, total, w, num, den,
    )
    assert row.morans_i == pytest.approx((n * num) / (w * den))


def test_clustered_positive_checkerboard_negative(spark):
    # clustered: two dense blobs far apart -> adjacent cells share high/low
    blob = [(x, y) for x in range(3) for y in range(3) for _ in range(10)]
    far = [(x + 50, y + 50) for x, y, in [(0, 0), (0, 1), (1, 0), (1, 1)]]
    clustered = morans_i(spark.createDataFrame(blob + far, SCHEMA)).collect()[0]
    assert clustered.morans_i > 0
    # checkerboard counts (1 vs 5 alternating) on one connected block
    board = []
    for x in range(6):
        for y in range(6):
            board += [(x, y)] * (5 if (x + y) % 2 == 0 else 1)
    alt = morans_i(spark.createDataFrame(board, SCHEMA)).collect()[0]
    assert alt.morans_i < 0


def test_single_cell_has_null_i(spark):
    row = morans_i(spark.createDataFrame([(3, 4), (3, 4)], SCHEMA)).collect()[0]
    assert (row.n_cells, row.w_pairs, row.num) == (1, 0, 0)
    assert row.den == 0  # one cell: deviation is identically zero
    assert row.morans_i is None


def test_two_isolated_cells_no_adjacency(spark):
    row = morans_i(
        spark.createDataFrame([(0, 0), (0, 0), (10, 10)], SCHEMA)
    ).collect()[0]
    assert row.w_pairs == 0 and row.morans_i is None
    assert row.den > 0


def test_weighted_counts(spark):
    df = spark.createDataFrame(
        [(0, 0, 4), (0, 1, 4), (5, 5, 1)], "tile_x long, tile_y long, m long"
    )
    row = morans_i(df, weight_col="m").collect()[0]
    pts = [(0, 0)] * 4 + [(0, 1)] * 4 + [(5, 5)]
    assert (row.n_cells, row.total, row.w_pairs, row.num, row.den) == _brute(pts)


def test_empty_input_yields_zero_row(spark):
    df = spark.createDataFrame([], SCHEMA)
    row = morans_i(df).collect()[0]
    assert (row.n_cells, row.total, row.w_pairs, row.num, row.den) == (0, 0, 0, 0, 0)
    assert row.morans_i is None
