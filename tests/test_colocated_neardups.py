"""phash_near_dups bucket_cols: colocated near-dup semantics — same-tile
near pairs found, cross-tile near pairs excluded, bucket values emitted,
and default behavior unchanged."""

from __future__ import annotations

from fairy_core_spark.operators.dedup import phash_near_dups

SCHEMA = "image_id long, phash long, x long, y long"


def test_same_tile_found_cross_tile_excluded(spark):
    base = 0x123456789AB0
    rows = [
        (0, base, 5, 5),
        (1, base ^ 0b101, 5, 5),   # hamming 2, same tile -> pair
        (2, base ^ 0b1, 9, 9),     # hamming 1, DIFFERENT tile -> excluded
        (3, base ^ (1 << 20), 5, 5),  # hamming 1, same tile -> pair
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = sorted(
        (r.id_a, r.id_b, r.hamming, r.x, r.y)
        for r in phash_near_dups(df, id_col="image_id", bucket_cols=("x", "y")).collect()
    )
    assert out == [(0, 1, 2, 5, 5), (0, 3, 1, 5, 5), (1, 3, 3, 5, 5)]

    # without buckets the cross-tile pair IS found (superset)
    plain = {
        (r.id_a, r.id_b)
        for r in phash_near_dups(df, id_col="image_id").collect()
    }
    assert (0, 2) in plain and (0, 1) in plain


def test_empty_bucket_cols_matches_original_shape(spark):
    rows = [(0, 7, 1, 1), (1, 7, 2, 2)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = phash_near_dups(df, id_col="image_id").collect()
    assert [tuple(r) for r in out] == [(0, 1, 0)]
    assert out[0].__fields__ == ["id_a", "id_b", "hamming"]
