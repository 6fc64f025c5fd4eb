"""Published H3 index-layout compat (spatial/h3_layout.py).

The two pinned hex strings below are the published library's own
documented example family (h3geo.org quickstart): 8928308280fffff is a
valid res-9 cell and its res-8 parent is 8828308281fffff. They pin the
bit layout end-to-end: decoding one and re-deriving the other uses every
field (mode, res, base cell, digit positions, unused-digit fill).
Everything else is property-tested (numpy vs Column agreement, pentagon
counts, compact/uncompact inverses).
"""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fairy_core_spark.spatial import h3_layout as h3

DOC_CELL = "8928308280fffff"
DOC_PARENT_R8 = "8828308281fffff"


def _mk(base_cell: int, digits: list[int]) -> int:
    """Construct a cell id straight from the layout (the test's own
    independent encoder — one shift-OR per field, no library calls)."""
    res = len(digits)
    h = (h3.CELL_MODE << 59) | (res << 52) | (base_cell << 45)
    for d in range(1, h3.MAX_RES + 1):
        dig = digits[d - 1] if d <= res else 7
        h |= dig << (3 * (h3.MAX_RES - d))
    return h


def test_doc_vector_decodes():
    h = h3.string_to_cell([DOC_CELL])
    assert h3.is_valid_cell(h).all()
    assert h3.get_resolution(h)[0] == 9
    assert h3.get_base_cell(h)[0] == 20
    for d in range(1, 10):
        assert 0 <= h3.get_digit(h, d)[0] <= 6
    for d in range(10, 16):
        assert h3.get_digit(h, d)[0] == 7
    assert h3.cell_to_string(h)[0] == DOC_CELL


def test_doc_vector_parent_chain():
    h = h3.string_to_cell([DOC_CELL])
    p8 = h3.cell_to_parent(h, 8)
    assert h3.cell_to_string(p8)[0] == DOC_PARENT_R8
    assert h3.is_valid_cell(p8).all()
    # parent is idempotent at its own res and monotone up the chain
    assert h3.cell_to_parent(p8, 8)[0] == p8[0]
    p0 = h3.cell_to_parent(h, 0)
    assert h3.get_resolution(p0)[0] == 0
    assert h3.get_base_cell(p0)[0] == 20
    # every set digit of the res-0 ancestor is the unused marker
    for d in range(1, 16):
        assert h3.get_digit(p0, d)[0] == 7


def test_constructed_ids_roundtrip_and_validity():
    rng = np.random.default_rng(7)
    hexa = [b for b in range(h3.NUM_BASE_CELLS) if b not in h3.PENTAGON_BASE_CELLS]
    ids = []
    for _ in range(300):
        res = int(rng.integers(0, 16))
        bc = int(rng.choice(hexa))
        ids.append(_mk(bc, [int(x) for x in rng.integers(0, 7, res)]))
    arr = np.asarray(ids, dtype=np.int64)
    assert h3.is_valid_cell(arr).all()
    assert (h3.string_to_cell(h3.cell_to_string(arr)) == arr).all()
    # parent of child-of-x at x's res is x
    res = h3.get_resolution(arr)
    for cr in (5, 10):
        sub = arr[res <= cr]
        centers = h3.cell_to_center_child(sub, cr)
        assert h3.is_valid_cell(centers).all()
        back = h3.cell_to_parent(centers, 0)
        assert (h3.get_base_cell(back) == h3.get_base_cell(sub)).all()
        for i in range(min(20, len(sub))):
            r = int(h3.get_resolution(sub[i : i + 1])[0])
            assert h3.cell_to_parent(centers[i : i + 1], r)[0] == sub[i]


def test_validity_rejects_each_corruption_class():
    h = int(h3.string_to_cell([DOC_CELL])[0])
    vals = [
        0,  # zero
        h | (1 << 63),  # reserved high bit (negative)
        (h & ~(0xF << 59)) | (2 << 59),  # wrong mode
        h | (1 << 56),  # cell-mode reserved bits
        (h & ~(0x7F << 45)) | (122 << 45),  # base cell out of range
        h & ~(7 << (3 * (15 - 10))),  # digit 10 not 7 at res 9 (0)
        h | (7 << (3 * (15 - 9))),  # digit 9 == 7 inside res
    ]
    bad = np.asarray(
        [v - (1 << 64) if v >= 1 << 63 else v for v in vals], dtype=np.int64
    )
    assert (~h3.is_valid_cell(bad)).all()


def test_pentagon_rules():
    pent0 = _mk(4, [])
    assert h3.is_pentagon(np.asarray([pent0]))[0]
    assert h3.is_valid_cell(np.asarray([pent0]))[0]
    # first nonzero digit K (1) under a pentagon base cell is invalid...
    bad = _mk(4, [0, 1, 3])
    assert not h3.is_valid_cell(np.asarray([bad]))[0]
    # ...but a 1 AFTER a nonzero digit is fine (subsequence only deleted
    # at the leading position)
    ok = _mk(4, [2, 1, 3])
    assert h3.is_valid_cell(np.asarray([ok]))[0]
    assert not h3.is_pentagon(np.asarray([ok]))[0]
    # center-child chain of a pentagon stays a pentagon
    cc = h3.cell_to_center_child(np.asarray([pent0]), 4)
    assert h3.is_pentagon(cc)[0]


def test_children_counts_and_inverse():
    hex_cell = _mk(20, [3, 2])
    pent_cell = _mk(38, [0])
    for cell, n, expect in [
        (hex_cell, 2, 49),
        (hex_cell, 0, 1),
        (pent_cell, 1, 6),
        (pent_cell, 2, 41),  # 1 + 5*(7^2 - 1)/6
    ]:
        res = int(h3.get_resolution(np.asarray([cell]))[0])
        kids = h3.cell_to_children(cell, res + n)
        assert kids.shape == (expect,)
        size = h3.cell_to_children_size(np.asarray([cell]), res + n)[0]
        assert size == expect
        assert h3.is_valid_cell(kids).all()
        assert (h3.cell_to_parent(kids, res) == cell).all()
        assert len(np.unique(kids)) == expect
    # closed form vs enumeration for a deeper pentagon expansion
    assert h3.cell_to_children_size(np.asarray([_mk(38, [])]), 3)[0] == 1 + 5 * (7**3 - 1) // 6


def test_column_ops_agree_with_numpy(spark):
    rng = np.random.default_rng(11)
    ids = []
    for _ in range(400):
        res = int(rng.integers(0, 16))
        bc = int(rng.integers(0, 140))  # includes invalid base cells
        digs = [int(x) for x in rng.integers(0, 8, res)]  # includes digit 7
        ids.append(_mk(bc % 128, digs))
    ids += [int(h3.string_to_cell([DOC_CELL])[0]), 0, -1]
    arr = np.asarray(ids, dtype=np.int64)
    df = spark.createDataFrame([(int(x),) for x in arr], "cell long")
    got = df.select(
        h3.res_col(F.col("cell")).alias("r"),
        h3.base_cell_col(F.col("cell")).alias("b"),
        h3.is_valid_col(F.col("cell")).alias("v"),
        h3.is_pentagon_col(F.col("cell")).alias("p"),
        h3.parent_col(F.col("cell"), 0).alias("par0"),
    ).toPandas()
    assert (got["r"].to_numpy() == h3.get_resolution(arr)).all()
    assert (got["b"].to_numpy() == h3.get_base_cell(arr)).all()
    assert (got["v"].to_numpy() == h3.is_valid_cell(arr)).all()
    assert (got["p"].to_numpy() == h3.is_pentagon(arr)).all()
    assert (got["par0"].to_numpy() == h3.cell_to_parent(arr, 0)).all()


def test_children_col_matches_numpy(spark):
    cells = [_mk(20, [3]), _mk(38, [0]), _mk(4, [])]
    df = spark.createDataFrame([(c,) for c in cells], "cell long")
    rows = (
        df.select("cell", h3.children_col(F.col("cell"), 1, 3).alias("kids"))
        .where(h3.res_col(F.col("cell")) == 1)
        .toPandas()
    )
    for _, row in rows.iterrows():
        expect = h3.cell_to_children(int(row["cell"]), 3)
        assert sorted(row["kids"]) == expect.tolist()
    # res-0 pentagon via the res-0 branch
    rows0 = (
        df.where(h3.res_col(F.col("cell")) == 0)
        .select("cell", h3.children_col(F.col("cell"), 0, 2).alias("kids"))
        .toPandas()
    )
    for _, row in rows0.iterrows():
        expect = h3.cell_to_children(int(row["cell"]), 2)
        assert sorted(row["kids"]) == expect.tolist()
        assert len(row["kids"]) == 1 + 5 * (7**2 - 1) // 6


def test_compact_uncompact_roundtrip(spark):
    # a full res-2 cover of one res-0 hexagon plus a pentagon's res-2
    # cover: compact must collapse each to its res-0 cell; uncompact must
    # reproduce the exact cover
    for bc in (20, 38):
        top = _mk(bc, [])
        cover = h3.cell_to_children(top, 2)
        df = spark.createDataFrame([(int(c),) for c in cover], "cell long")
        compacted = h3.compact_cells_df(df, "cell").toPandas()["cell"].tolist()
        assert compacted == [top]
        back = (
            h3.uncompact_cells_df(
                spark.createDataFrame([(top,)], "cell long"), 2, "cell"
            )
            .toPandas()["cell"]
            .to_numpy()
        )
        assert np.array_equal(np.sort(back), cover)


def test_compact_partial_cover_keeps_leftovers(spark):
    top = _mk(20, [])
    cover = h3.cell_to_children(top, 2).tolist()
    missing = cover[0]
    df = spark.createDataFrame([(int(c),) for c in cover[1:]], "cell long")
    out = np.sort(h3.compact_cells_df(df, "cell").toPandas()["cell"].to_numpy())
    # the six complete sibling groups not containing `missing` collapse to
    # their res-1 parents; the incomplete group keeps its 6 leaves
    parents = np.unique(h3.cell_to_parent(np.asarray(cover[1:], dtype=np.int64), 1))
    gap_parent = h3.cell_to_parent(np.asarray([missing], dtype=np.int64), 1)[0]
    expect = sorted(
        [int(p) for p in parents if p != gap_parent]
        + [int(c) for c in cover[1:] if h3.cell_to_parent(np.asarray([c], dtype=np.int64), 1)[0] == gap_parent]
    )
    assert out.tolist() == expect


def test_parent_rejects_bad_res():
    h = h3.string_to_cell([DOC_CELL])
    with pytest.raises(ValueError):
        h3.cell_to_parent(h, 10)
    with pytest.raises(ValueError):
        h3.cell_to_parent(h, -1)
    with pytest.raises(ValueError):
        h3.cell_to_children(int(h[0]), 8)
