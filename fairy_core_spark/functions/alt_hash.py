"""dHash (gradient) and aHash (mean) 64-bit image hashes, pure numpy.

Complements the DCT pHash (functions/phash.py) with the two other hashes a
web-scale image-dedup pipeline conventionally runs side by side (north-rule
§2.6 family; reference has no image code — semantics pinned here):

- **aHash**: grayscale -> 8x8 area mean-pool -> bit set iff pixel > mean
  of the 64 pooled pixels (strict).
- **dHash**: grayscale -> 8 rows x 9 cols -> bit set iff g[r,c] > g[r,c+1]
  (strict; horizontal gradient, 8x8 = 64 bits).

Bit order and int64 packing match phash64: row-major, first bit is the
MSB, two's-complement into signed int64 (LongType-safe). Grayscale uses
the same BT.601 luma as phash; pooling is the same exact block mean when
the source dimension divides the grid, nearest-index resample otherwise —
so all three hashes see identical grayscale semantics.

Everything is batched over (N, h, w, 3) same-size stacks; scalar wrappers
exist for tests only. ``alt_hashes`` is the operator: one Arrow
``mapInPandas`` decode pass -> (image_id, dhash, ahash), a pure projection
(no shuffle) at any scale.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

# the shared grayscale/pool kernel lives with pHash so all three hashes
# read the SAME implementation (cross-hash semantics cannot drift)
from fairy_core_spark.functions.phash import gray_pool_stack as _gray_pool_stack


def _pack_bits64(bits: np.ndarray) -> np.ndarray:
    """(N, 64) bool, row-major MSB-first -> signed int64 array (same
    packing as phash64: bit 0 of the flat block is the sign bit)."""
    weights = (1 << np.arange(63, -1, -1).astype(np.uint64))
    v = (bits.astype(np.uint64) * weights).sum(axis=1)
    return v.view(np.int64) if v.dtype == np.uint64 else v.astype(np.int64)


def ahash64_stack(stack: np.ndarray) -> np.ndarray:
    """Vectorized aHash over a (N, h, w, 3) uint8 stack -> int64 array."""
    g = _gray_pool_stack(stack, 8, 8).reshape(len(stack), 64)
    mean = g.mean(axis=1, keepdims=True)
    return _pack_bits64(g > mean)


def dhash64_stack(stack: np.ndarray) -> np.ndarray:
    """Vectorized dHash over a (N, h, w, 3) uint8 stack -> int64 array."""
    g = _gray_pool_stack(stack, 8, 9)
    bits = (g[:, :, :-1] > g[:, :, 1:]).reshape(len(stack), 64)
    return _pack_bits64(bits)


def ahash64(pixels: np.ndarray) -> int:
    """aHash of one uint8 HxWx3 image -> signed 64-bit int."""
    return int(ahash64_stack(pixels[None])[0])


def dhash64(pixels: np.ndarray) -> int:
    """dHash of one uint8 HxWx3 image -> signed 64-bit int."""
    return int(dhash64_stack(pixels[None])[0])


def alt_hashes(images) -> "DataFrame":  # noqa: F821 - pyspark import kept lazy
    """images(image_id, bytes, fmt, ...) -> (image_id, dhash, ahash).

    One Arrow decode pass; per-(h, w) size groups hashed with batched
    numpy (no per-pixel Python). Undecodable rows are dropped — alt
    hashes exist only for decodable pixels (decode *validation* is
    ``operators/images.with_image_checks``'s job, not this one's)."""
    import pandas as pd

    from fairy_core_spark.functions.image_codec import decode_image

    def run(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            ids = pdf["image_id"].tolist()
            blobs = pdf["bytes"].tolist()
            fmts = pdf["fmt"].tolist()
            groups: dict[tuple[int, int], tuple[list[str], list[np.ndarray]]] = {}
            for i in range(len(pdf)):
                try:
                    px = decode_image(blobs[i], fmts[i])
                except Exception:
                    continue
                if px.ndim != 3 or px.shape[2] != 3:
                    continue
                gid, gpx = groups.setdefault(px.shape[:2], ([], []))
                gid.append(ids[i])
                gpx.append(px)
            out_ids: list[str] = []
            dh: list[np.ndarray] = []
            ah: list[np.ndarray] = []
            for gid, gpx in groups.values():
                stack = np.stack(gpx)
                out_ids.extend(gid)
                dh.append(dhash64_stack(stack))
                ah.append(ahash64_stack(stack))
            yield pd.DataFrame({
                "image_id": out_ids,
                "dhash": np.concatenate(dh) if dh else np.array([], np.int64),
                "ahash": np.concatenate(ah) if ah else np.array([], np.int64),
            })

    return images.mapInPandas(run, schema="image_id string, dhash long, ahash long")
