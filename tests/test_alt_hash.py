"""dHash/aHash semantics pinned on hand-computable images + operator
plumbing (decode pass, dup planting, undecodable-row drop).

The contract-golden oracle (queries.image_alt_hash_dups) trusts the frozen
per-image hash values; THESE tests are what pins the hash math itself, by
hand-derivation — mirroring the phash split (tests/test_images.py pins the
DCT, the gate cross-checks the grouping).
"""

from __future__ import annotations

import numpy as np
import pytest

from fairy_core_spark.functions.alt_hash import (
    ahash64,
    ahash64_stack,
    dhash64,
    dhash64_stack,
)


def _img(w: int, h: int, cols: np.ndarray) -> np.ndarray:
    """uint8 HxWx3 image whose every row equals `cols` (len w) in all
    three channels — grayscale equals `cols` exactly (luma sums to 1)."""
    assert len(cols) == w
    return np.repeat(cols[None, :, None], 3, axis=2).repeat(h, axis=0).reshape(
        h, w, 3
    ).astype(np.uint8)


def test_constant_image_hashes_to_zero():
    img = np.full((64, 72, 3), 77, dtype=np.uint8)
    assert ahash64(img) == 0  # strict >: nothing exceeds the mean
    assert dhash64(img) == 0  # no horizontal gradient anywhere


def test_ahash_left_bright_step_hand_derived():
    # w=72 divides 8 -> exact pooling (9px blocks). Left 36 cols bright:
    # pooled cols 0-3 = 255, cols 4-7 = 0, mean 127.5 -> per-row byte 0xF0.
    cols = np.where(np.arange(72) < 36, 255, 0)
    img = _img(72, 64, cols)
    assert ahash64(img) == 0xF0F0F0F0F0F0F0F0 - (1 << 64)  # sign bit set


def test_dhash_step_hand_derived():
    # w=72 divides 9 -> exact pooling (8px blocks). Left 36 cols bright:
    # pooled 9 cols = [255,255,255,255,127.5,0,0,0,0]; strict-decreasing
    # pairs at (3,4) and (4,5) -> per-row byte 0b00011000 = 0x18.
    cols = np.where(np.arange(72) < 36, 255, 0)
    img = _img(72, 64, cols)
    assert dhash64(img) == 0x1818181818181818


def test_dhash_sign_bit_packing():
    # only pooled col 0 bright -> single decreasing pair (0,1) -> per-row
    # byte 0x80; first bit of the flat block is the int64 sign bit.
    cols = np.where(np.arange(72) < 8, 255, 0)
    img = _img(72, 64, cols)
    assert dhash64(img) == 0x8080808080808080 - (1 << 64)


def test_increasing_gradient_dhash_zero():
    # monotonically non-decreasing columns -> no strict left>right pair
    cols = (np.arange(72) * 255 // 71).astype(np.uint8)
    img = _img(72, 64, cols)
    assert dhash64(img) == 0


def test_stack_matches_scalar_on_odd_sizes():
    rng = np.random.default_rng(7)
    stack = rng.integers(0, 256, size=(5, 50, 37, 3), dtype=np.uint8)
    assert list(dhash64_stack(stack)) == [dhash64(p) for p in stack]
    assert list(ahash64_stack(stack)) == [ahash64(p) for p in stack]
    # 50 % 8 != 0 and 37 % 9 != 0 -> exercises the nearest-resample rule


def test_identical_pixels_same_hash_different_encoding():
    from fairy_core_spark.datagen.images import make_pixels

    px = make_pixels("img0000000042", 48, 32)
    assert dhash64(px) == dhash64(px.copy())
    assert ahash64(px) == ahash64(px.copy())


@pytest.mark.usefixtures("spark")
def test_alt_hashes_operator(spark):
    from fairy_core_spark.datagen.images import images_df
    from fairy_core_spark.functions.alt_hash import alt_hashes

    dirty = alt_hashes(images_df(spark, 1200, dirty_every=50)).toPandas()
    # truncated/bad_fmt variants ((i//50)%4 in {2,3}, 6 each) never decode
    # -> dropped; null-caption + dim-mismatch variants still decode.
    assert len(dirty) == 1200 - 12

    got = alt_hashes(images_df(spark, 1000)).toPandas().set_index("image_id")
    assert len(got) == 1000
    # planted dup: img...999 duplicates img...998's pixels
    a, b = "img0000000999", "img0000000998"
    assert got.loc[a, "dhash"] == got.loc[b, "dhash"]
    assert got.loc[a, "ahash"] == got.loc[b, "ahash"]
    assert got["dhash"].dtype == np.int64 and got["ahash"].dtype == np.int64
