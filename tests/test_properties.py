"""Property-based tests (hypothesis) — beyond the reference's test strategy
(SURVEY.md §5: "No property-based testing" there). Invariants that goldens
can't pin because they hold over the whole input space:

- S2 hierarchy nests: the parent of the level-L cell containing p IS the
  level-(L-1) cell containing p.
- S2 leaf encode/decode roundtrips exactly.
- haversine is a symmetric pre-metric with zero self-distance.
- ray-cast PIP agrees with the closed-form answer on random rectangles.
- rule predicates match the reference's pandas semantics
  (pd.isna | strip=='' for required; to_numeric coerce for range; normalize
  then set-membership for enum) on adversarial generated cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from fairy_core_spark.functions.geometry import haversine_m, point_in_ring
from fairy_core_spark.spatial import s2

lat_st = st.floats(min_value=-89.0, max_value=89.0, allow_nan=False)
lon_st = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(lat_st, lon_st), min_size=1, max_size=20), st.integers(2, 20))
def test_s2_parent_nesting(points, level):
    lat = np.array([p[0] for p in points])
    lon = np.array([p[1] for p in points])
    fine = s2.cell_id(lat, lon, level)
    coarse = s2.cell_id(lat, lon, level - 1)
    assert (s2.parent(fine, level - 1) == coarse).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(lat_st, lon_st), min_size=1, max_size=20))
def test_s2_leaf_roundtrip(points):
    lat = np.array([p[0] for p in points])
    lon = np.array([p[1] for p in points])
    leaf = s2.cell_id(lat, lon, s2.MAX_LEVEL)
    face, i, j = s2.to_face_ij(leaf)
    assert (s2.from_face_ij(face, i, j) == leaf).all()


@settings(max_examples=50, deadline=None)
@given(lat_st, lon_st, lat_st, lon_st)
def test_haversine_symmetric_nonnegative(lat1, lon1, lat2, lon2):
    a = np.array([lat1]), np.array([lon1])
    b = np.array([lat2]), np.array([lon2])
    d_ab = haversine_m(a[0], a[1], b[0], b[1])[0]
    d_ba = haversine_m(b[0], b[1], a[0], a[1])[0]
    assert d_ab >= 0.0
    assert abs(d_ab - d_ba) <= 1e-6 * max(d_ab, 1.0)
    assert haversine_m(a[0], a[1], a[0], a[1])[0] == 0.0


@settings(max_examples=100, deadline=None)
@given(
    st.floats(-80, 80, allow_nan=False),
    st.floats(-170, 170, allow_nan=False),
    st.floats(0.01, 9.0),
    st.floats(0.01, 9.0),
    st.floats(-0.5, 1.5),
    st.floats(-0.5, 1.5),
)
def test_pip_rect_closed_form(lat0, lon0, dlat, dlon, fy, fx):
    """random rectangle + a probe at fractional offset (fy, fx): ray-cast
    answer must equal the closed-form bounds check (probes landing within
    1e-9 of an edge are skipped — boundary orientation is unspecified)."""
    ring = np.array(
        [
            [lat0, lon0],
            [lat0, lon0 + dlon],
            [lat0 + dlat, lon0 + dlon],
            [lat0 + dlat, lon0],
            [lat0, lon0],
        ]
    )
    plat, plon = lat0 + fy * dlat, lon0 + fx * dlon
    on_edge = min(abs(fy), abs(1 - fy)) * dlat < 1e-9 or min(abs(fx), abs(1 - fx)) * dlon < 1e-9
    if on_edge:
        return
    want = (0 < fy < 1) and (0 < fx < 1)
    got = bool(point_in_ring(np.array([plat]), np.array([plon]), ring)[0])
    assert got == want


# ---- rule predicates vs reference pandas semantics (needs Spark) ----

cell_st = st.one_of(
    st.none(),
    st.just(""),
    st.just("   "),
    st.text(alphabet=" abAB019.-e", max_size=8),
    st.integers(-1000, 1000).map(str),
    st.floats(-100, 100, allow_nan=False).map(lambda x: f"{x:.3f}"),
)


@settings(max_examples=12, deadline=None)
@given(st.lists(cell_st, min_size=1, max_size=30))
def test_rule_predicates_match_pandas_reference(spark, cells):
    from fairy_core_spark.operators.rules import enum_pred, nullish_pred, range_pred

    df = spark.createDataFrame([(i, c) for i, c in enumerate(cells)], "i long, v string")
    got = {
        r["i"]: (bool(r["nul"]), bool(r["rng"]), bool(r["enm"]))
        for r in df.select(
            "i",
            nullish_pred("v").alias("nul"),
            range_pred("v", 0.0, 10.0, True).alias("rng"),
            enum_pred("v", ["ab", "AB", "1"], {"trim": True, "casefold": True}).alias("enm"),
        ).collect()
    }
    s = pd.Series(cells, dtype=object)
    want_nul = s.isna() | s.fillna("x").astype(str).str.strip().eq("")
    num = pd.to_numeric(s, errors="coerce")
    want_rng = num.isna() | (num < 0.0) | (num > 10.0)
    normed = s.fillna("\0").astype(str).str.strip().str.lower()
    allow = {"ab", "1"}  # casefolded allow list
    want_enm = s.isna() | ~normed.isin(allow)
    for i in range(len(cells)):
        assert got[i][0] == bool(want_nul[i]), (cells[i], "nullish")
        assert got[i][1] == bool(want_rng[i]), (cells[i], "range")
        assert got[i][2] == bool(want_enm[i]), (cells[i], "enum")


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.floats(min_value=-1.0, max_value=1.0, allow_nan=False), min_size=1, max_size=500),
    st.sampled_from([4000, 8000, 44100]),
)
def test_wav_roundtrip_property(samples, rate):
    """PCM16 encode/decode round-trips any [-1,1] signal within two
    quantization steps (half-step rounding + the 32767-encode/32768-decode
    scale asymmetry contributes up to |x|/32768), preserves length/rate,
    and stays inside [-1,1]."""
    import numpy as np

    from fairy_core_spark.functions.av_codec import decode_wav, encode_wav

    x = np.array(samples)
    y, r = decode_wav(encode_wav(x, rate))
    assert r == rate and y.shape == (len(x), 1)
    assert np.abs(y[:, 0] - x).max() <= 2.0 / 32768 + 1e-12
    assert y.min() >= -1.0 and y.max() <= 1.0


# --- hex7 lattice invariants (the hexagonal sibling of the S2 block) ----


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(lat_st, lon_st), min_size=1, max_size=20), st.integers(0, 14))
def test_hex7_lattice_roundtrip(points, res):
    from fairy_core_spark.spatial import hex7

    lat = np.array([p[0] for p in points])
    lon = np.array([p[1] for p in points])
    c = hex7.cell_id(lat, lon, res)
    f, i, j, r = hex7.cell_to_ij(c)
    assert (r == res).all()
    assert np.array_equal(hex7.ij_to_cell(f, i, j, res), c)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(lat_st, lon_st), min_size=1, max_size=20),
       st.integers(1, 14), st.data())
def test_hex7_parent_is_bit_prefix(points, res, data):
    """parent id == child id with trailing digits zeroed + res rewritten —
    the locality/prefix property every range-pruning trick relies on."""
    from fairy_core_spark.spatial import hex7

    pr = data.draw(st.integers(0, res - 1))
    lat = np.array([p[0] for p in points])
    lon = np.array([p[1] for p in points])
    c = hex7.cell_id(lat, lon, res)
    p = hex7.cell_to_parent(c, pr)
    assert (hex7.cell_res(p) == pr).all()
    drop = 42 - 3 * pr
    mask = ((1 << 59) - 1) & ~((1 << drop) - 1)
    assert np.array_equal(p & mask, c & mask)  # shared prefix
    assert (p & ((1 << drop) - 1) == 0).all()  # zeroed tail


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(lat_st, lon_st), min_size=1, max_size=10),
       st.integers(0, 11), st.data())
def test_hex7_compact_uncompact_roundtrip_property(points, res, data):
    from fairy_core_spark.spatial import hex7

    depth = data.draw(st.integers(1, 2))
    lat = np.array([p[0] for p in points])
    lon = np.array([p[1] for p in points])
    base = np.unique(hex7.cell_id(lat, lon, res))
    exp = hex7.uncompact_cells(base, res + depth)
    assert len(exp) == len(base) * 7**depth
    assert np.array_equal(hex7.compact_cells(exp), np.sort(base))
    # any strict subset missing one leaf cannot fully compact
    if len(exp) > 1:
        partial = hex7.compact_cells(exp[1:])
        assert len(partial) > len(base) - 1
        assert np.array_equal(hex7.uncompact_cells(partial, res + depth), np.sort(exp[1:]))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(alphabet="abcxyz", min_size=1, max_size=5), min_size=0, max_size=30),
       st.integers(2, 8))
def test_window_hashes_matches_python_reference(spark, tokens_list, n):
    """The direct-index window fold equals a plain-Python reference of the
    contract (md5-60bit token hash + polynomial combine) for arbitrary
    token lists — positions, order, and values."""
    import hashlib

    from fairy_core_spark.operators.dedup import _HASH_A, _MERSENNE_P

    def md5_60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    th = [md5_60(t) % _MERSENNE_P for t in tokens_list]
    want = []
    for i in range(max(len(th) - n + 1, 0)):
        acc = th[i]
        for k in range(1, n):
            acc = (acc * _HASH_A + th[i + k]) % _MERSENNE_P
        want.append(acc)

    import pandas as pd
    from pyspark.sql import functions as F

    from fairy_core_spark.operators.dedup import window_hashes

    df = spark.createDataFrame(pd.DataFrame({"text": [" ".join(tokens_list)]}))
    got = df.select(window_hashes(F.col("text"), n).alias("w")).collect()[0]["w"]
    assert got == want


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.tuples(lat_st, lon_st), min_size=1, max_size=20),
    st.data(),
)
def test_parent_composition_and_idempotence(points, data):
    """parent algebra both schemes lean on for the pyramid: composition
    (parent of parent at l == parent at l) and idempotence at own level."""
    from fairy_core_spark.spatial import hex7

    lat = np.array([p[0] for p in points])
    lon = np.array([p[1] for p in points])

    base = data.draw(st.integers(4, 20), label="s2_base")
    mid = data.draw(st.integers(2, base - 1), label="s2_mid")
    lo = data.draw(st.integers(0, mid - 1), label="s2_lo")
    c = s2.cell_id(lat, lon, base)
    assert (s2.parent(s2.parent(c, mid), lo) == s2.parent(c, lo)).all()
    assert (s2.parent(s2.parent(c, mid), mid) == s2.parent(c, mid)).all()

    hbase = data.draw(st.integers(3, 8), label="h_base")
    hmid = data.draw(st.integers(1, hbase - 1), label="h_mid")
    hlo = data.draw(st.integers(0, hmid - 1), label="h_lo")
    hc = hex7.cell_id(lat, lon, hbase)
    assert (
        hex7.cell_to_parent(hex7.cell_to_parent(hc, hmid), hlo)
        == hex7.cell_to_parent(hc, hlo)
    ).all()
    assert (
        hex7.cell_to_parent(hex7.cell_to_parent(hc, hmid), hmid)
        == hex7.cell_to_parent(hc, hmid)
    ).all()
