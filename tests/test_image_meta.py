"""Metadata-only image corpus filter + caption dedup.

Three layers:
  1. reason precedence / predicate edges on hand-built rows (no datagen);
  2. caption_exact_dups semantics on a tiny hand-built frame;
  3. the gate oracle's DuckDB regeneration of the synthetic image table's
     metadata (queries._image_meta_regen_sql) vs the actual datagen rows —
     the non-circularity anchor for both new gate entries: if datagen and
     the SQL replay ever drift, this fails before the gate does.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from fairy_core_spark.operators.images import (
    META_FILTER_REASONS,
    caption_exact_dups,
    image_meta_filter,
)

COLS = ["image_id", "w", "h", "fmt", "caption"]


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=COLS).astype(
            {"w": "int32", "h": "int32"}
        )
    )


def _reasons(spark, rows) -> dict[str, str | None]:
    out = image_meta_filter(_df(spark, rows)).select("image_id", "reject_reason")
    return {r["image_id"]: r["reject_reason"] for r in out.collect()}


def test_reason_precedence_and_edges(spark):
    cap = "caption for {}: one two three"
    rows = [
        ("keep", 48, 64, "ppm", cap.format("keep")),  # 64/48 < 1.5: kept
        ("nullcap", 48, 48, "ppm", None),
        ("blankcap", 48, 48, "ppm", "   "),
        ("shortcap", 48, 48, "ppm", "caption for shortcap: one two"),
        ("noprefix", 48, 48, "ppm", "just words no separator"),
        # caption wins over every later reason
        ("cap_first", 32, 64, "jpeg", None),
        ("fmt_first", 32, 64, "jpeg", cap.format("fmt_first")),
        # strict > 3/2: 48x32 is 1.5 exactly -> NOT bad_aspect, but too_small
        ("ratio_eq", 48, 32, "ppm", cap.format("ratio_eq")),
        ("ratio_gt", 64, 32, "ppm", cap.format("ratio_gt")),
        ("small", 32, 32, "ppm", cap.format("small")),
    ]
    got = _reasons(spark, rows)
    assert got == {
        "keep": None,
        "nullcap": "caption_missing",
        "blankcap": "caption_missing",
        "shortcap": "caption_missing",
        "noprefix": "caption_missing",
        "cap_first": "caption_missing",
        "fmt_first": "bad_fmt",
        "ratio_eq": "too_small",
        "ratio_gt": "bad_aspect",
        "small": "too_small",
    }
    assert set(v for v in got.values() if v) <= set(META_FILTER_REASONS)


def test_meta_filter_is_pure_projection(spark):
    """no exchange in the plan — the filter must stay a scan-side projection."""
    rows = [("a", 48, 48, "ppm", "caption for a: one two three")]
    plan = image_meta_filter(_df(spark, rows))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_caption_exact_dups(spark):
    rows = [
        ("a1", 48, 48, "ppm", "caption for a1: red fox den"),
        ("a2", 48, 48, "png", "caption for a2: red fox den"),
        ("a3", 48, 48, "qnt", "caption for a3: red fox den"),
        ("b1", 48, 48, "ppm", "caption for b1: lone body"),
        ("c1", 48, 48, "ppm", None),
        ("c2", 48, 48, "ppm", None),  # nulls never group
    ]
    out = caption_exact_dups(_df(spark, rows)).collect()
    assert len(out) == 1
    row = out[0]
    assert (row["caption_body"], row["n"], row["keeper_id"]) == ("red fox den", 3, "a1")


@pytest.mark.parametrize("dirty_every", [None, 50])
def test_regen_sql_matches_datagen(dirty_every):
    """DuckDB metadata regeneration == the real datagen rows, column for
    column, including the dup-row aliasing (i%1000==999) and all four dirty
    variants' metadata effects."""
    from fairy_core_spark.datagen.images import synth_image_rows_batch
    from fairy_core_spark.queries import _image_meta_regen_sql

    n = 1200  # crosses the i=999 dup row and 24 dirty rows at de=50
    pdf = synth_image_rows_batch(list(range(n)), dirty_every=dirty_every)
    want = (
        pdf[COLS].sort_values("image_id").reset_index(drop=True)
    )
    got = (
        duckdb.sql(_image_meta_regen_sql(n, dirty_every=dirty_every))
        .df()[COLS]
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    got["w"] = got["w"].astype(want["w"].dtype)
    got["h"] = got["h"].astype(want["h"].dtype)
    pd.testing.assert_frame_equal(got, want)


def test_pixel_stats_hand_counts(spark):
    """integer moments over hand-built images, incl. the quantized (lossy)
    codec path and undecodable-row drop; low-information flags."""
    import numpy as np

    from fairy_core_spark.functions.image_codec import decode_image, encode_image
    from fairy_core_spark.operators.images import flag_low_information, image_pixel_stats

    solid = np.full((4, 4, 3), 100, dtype=np.uint8)
    grad = np.zeros((2, 3, 3), dtype=np.uint8)
    grad[..., 0] = np.array([[0, 100, 200], [0, 100, 200]])  # g=b=0
    rows = [
        ("solid", bytearray(encode_image(solid, "ppm")), 4, 4, "ppm", "c", 0),
        ("grad", bytearray(encode_image(grad, "ppm")), 3, 2, "ppm", "c", 0),
        ("qsolid", bytearray(encode_image(solid, "qnt")), 4, 4, "qnt", "c", 0),
        ("broken", bytearray(b"xx"), 4, 4, "ppm", "c", 0),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
    )
    got = {r["image_id"]: r.asDict() for r in image_pixel_stats(df).collect()}
    assert set(got) == {"solid", "grad", "qsolid"}  # broken dropped
    assert got["solid"]["n_px"] == 48 and got["solid"]["px_sum"] == 4800
    assert got["solid"]["px_sqsum"] == 48 * 100 * 100
    assert (got["solid"]["px_min"], got["solid"]["px_max"]) == (100, 100)
    # gradient: channel r sums 2*(0+100+200)=600 over 18 values
    assert got["grad"]["n_px"] == 18 and got["grad"]["px_sum"] == 600
    assert got["grad"]["px_sqsum"] == 2 * (100**2 + 200**2)
    # qnt decode is (v >> 2) * 4 + 2 -> 100 -> 102
    q = decode_image(bytes(rows[2][1]), "qnt")
    assert int(q[0, 0, 0]) == 102
    assert got["qsolid"]["px_sum"] == 48 * 102

    flags = {
        r["image_id"]: r["info_flag"]
        for r in flag_low_information(image_pixel_stats(df)).collect()
    }
    assert flags["solid"] == "near_solid" and flags["qsolid"] == "near_solid"
    assert flags["grad"] is None  # full-range gradient: informative


def test_low_information_no_int64_overflow(spark):
    """a large high-variance image (n_px big enough that n*sqsum would
    overflow int64) must not be flagged."""
    n = 2500 * 2500 * 3  # 1.875e7 channel values
    # uniform-ish spread: half 0s, half 255s -> variance ~ 16256
    sum_ = (n // 2) * 255
    sq = (n // 2) * 255 * 255
    assert n * sq > 2**63  # the old integer form really would overflow
    df = spark.createDataFrame(
        [("big", n, sum_, sq, 0, 255)],
        "image_id string, n_px long, px_sum long, px_sqsum long, px_min int, px_max int",
    )
    from fairy_core_spark.operators.images import flag_low_information

    row = flag_low_information(df).collect()[0]
    assert row["info_flag"] is None


def test_caption_body_separator_in_body_cross_engine(spark):
    """the cross-engine body contract: everything after the FIRST ': '
    (Spark limit-2 split == DuckDB strpos/substr), pinned on a caption
    whose body itself contains the separator."""
    cap = "caption for x1: lorem: ipsum"
    rows = [("x1", 48, 48, "ppm", cap), ("x2", 48, 48, "ppm", "caption for x2: lorem: ipsum")]
    out = caption_exact_dups(_df(spark, rows)).collect()
    assert len(out) == 1 and out[0]["caption_body"] == "lorem: ipsum"
    got = duckdb.sql(
        "SELECT CASE WHEN strpos(caption, ': ') > 0"
        " THEN substr(caption, strpos(caption, ': ') + 2) END AS b"
        f" FROM (VALUES ('{cap}')) t(caption)"
    ).fetchone()[0]
    assert got == "lorem: ipsum"


def test_low_info_specials_closed_form(spark):
    """datagen.low_info_images_df: the planted degenerate images hit the
    documented closed-form moments (n=768, sum=768v[+16],
    sqsum=768v^2[+32v+256]) and exercise BOTH flag branches — solids ->
    near_solid, spikes (range 16 > 8, variance ~1/3) -> low_variance."""
    from fairy_core_spark.datagen.images import low_info_images_df
    from fairy_core_spark.operators.images import (
        flag_low_information,
        image_pixel_stats,
    )

    df = low_info_images_df(spark)
    rows = {r["image_id"]: r.asDict() for r in
            flag_low_information(image_pixel_stats(df)).collect()}
    assert len(rows) == 16
    for s in range(12):
        v = (s * 17) % 256
        r = rows[f"solid{s:04d}"]
        assert (r["n_px"], r["px_sum"], r["px_sqsum"]) == (768, 768 * v, 768 * v * v)
        assert r["px_min"] == r["px_max"] == v
        assert r["info_flag"] == "near_solid"
    for s in range(4):
        v = (s * 31) % 200
        r = rows[f"spike{s:04d}"]
        assert (r["px_sum"], r["px_sqsum"]) == (768 * v + 16, 768 * v * v + 32 * v + 256)
        assert (r["px_min"], r["px_max"]) == (v, v + 16)
        assert r["info_flag"] == "low_variance"


def test_phash_topk_ordering_and_exclusions(spark):
    """planted Hamming neighborhood: exact rank order, self-exclusion,
    band-candidate contract (a hash differing in all 4 bands is not a
    candidate even if Hamming-close by count)."""
    from fairy_core_spark.operators.dedup import phash_topk

    base = 0x0123_4567_89AB_CDEF
    rows = [
        ("q", base),
        ("a", base ^ 0x1),            # hamming 1, band 0
        ("b", base ^ 0x3),            # hamming 2, band 0
        ("c", base ^ (1 << 17)),      # hamming 1, band 1
        # differs by exactly one bit in EVERY band: hamming 4 but still a
        # candidate? no — all four band values differ -> excluded
        ("far", base ^ ((1 << 0) | (1 << 16) | (1 << 32) | (1 << 48))),
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "image_id string, phash long")
    qs = df.where(F.col("image_id") == "q")
    got = [
        (r["image_id"], r["hamming"], r["rk"])
        for r in phash_topk(df, qs, k=5).orderBy("rk").collect()
    ]
    assert got == [("a", 1, 1), ("c", 1, 2), ("b", 2, 3)]  # far excluded, no self


def test_dihedral_key_invariance_and_groups(spark):
    """the 8-transform orbit shares ONE key (incl. vertical flip =
    rot180 o mirror); distinct images keep distinct keys; the planted
    datagen orbits group while plain phash sees 5 hashes."""
    import numpy as np

    from fairy_core_spark.datagen.images import rotated_images_df
    from fairy_core_spark.functions.phash import phash64, phash64_dihedral_min
    from fairy_core_spark.operators.images import rotation_invariant_keys

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    k = phash64_dihedral_min(px)
    for t in (np.rot90(px), np.rot90(px, 3), px[::-1], px[:, ::-1].copy()):
        assert phash64_dihedral_min(np.ascontiguousarray(t)) == k
    other = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    assert phash64_dihedral_min(other) != k

    df = rotated_images_df(spark, n_groups=3)
    keys = {r["image_id"]: r["dkey"] for r in rotation_invariant_keys(df).collect()}
    phashes = {r["image_id"]: r["phash"] for r in df.select("image_id", "phash").collect()}
    for g in range(3):
        orbit = [f"rot{g:03d}v{v}" for v in range(5)]
        assert len({keys[i] for i in orbit}) == 1
        assert len({phashes[i] for i in orbit}) == 5  # plain phash scrambles
