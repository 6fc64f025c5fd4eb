"""Hilbert-curve tile encoding — the third space-filling curve beside
Z-order/geohash (spatial/zorder.py) and quadkey (spatial/webmercator.py),
and the one with the strongest locality guarantee: consecutive curve
positions are ALWAYS grid-adjacent (no Z-order "seams"), so a
Hilbert-clustered layout gives strictly fewer range fragments per bbox
on average. S2 (spatial/s2.py) uses the same curve on the sphere; this
module is the planar tile-space version for slippy-map grids.

North-rule op — the reference has no spatial code. Algorithm: the
classic iterative xy->d fold with quadrant rotation (Hilbert 1891 as
popularized in Warren, Hacker's Delight §16; the standard public
formulation):

    for s in (n/2 .. 1, halving):
        rx = 1 if x & s else 0
        ry = 1 if y & s else 0
        d += s*s * ((3*rx) ^ ry)
        if ry == 0:
            if rx == 1: x, y = s-1-x, s-1-y   # flip
            x, y = y, x                        # transpose

Physical strategy: the per-level state updates would duplicate
subtrees exponentially as one Column expression (CollapseProject
inlines each level's x/y into its ~3 uses at the next level), so the
encode runs as ONE vectorized numpy pass behind an Arrow pandas_udf —
the same shape as the s2/hex7 encodes, zero shuffle. The DuckDB twin
replays the identical fold as a RECURSIVE CTE stepping the bit index,
so the oracle carries per-level state in rows, not nested expressions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

MAX_ORDER = 31  # d = interleave of two order-bit coords fits int64 at 31


def _check_order(order: int) -> int:
    if not 1 <= int(order) <= MAX_ORDER:
        raise ValueError(f"order must be in [1, {MAX_ORDER}], got {order}")
    return int(order)


def xy2d(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    """Vectorized Hilbert (x, y) -> curve position d over a 2^order grid.

    Inputs must already be integer tile coords in [0, 2^order); values
    outside raise (callers clamp at the tile formula, so an out-of-range
    coord here is a bug, not data)."""
    order = _check_order(order)
    n = np.int64(1) << order
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    if x.size and (
        int(x.min()) < 0 or int(x.max()) >= n or int(y.min()) < 0 or int(y.max()) >= n
    ):
        raise ValueError(f"coords outside [0, 2^{order}) grid")
    d = np.zeros_like(x)
    s = n >> 1
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant: flip when ry==0 and rx==1, then transpose when ry==0
        flip = (ry == 0) & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= 1
    return d


def d2xy(d: np.ndarray, order: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized inverse (curve position -> tile coords) — the test-side
    twin that lets the adjacency property enumerate the curve in order."""
    order = _check_order(order)
    n = np.int64(1) << order
    t = np.asarray(d, dtype=np.int64).copy()
    x = np.zeros_like(t)
    y = np.zeros_like(t)
    s = np.int64(1)
    while s < n:
        rx = (t // 2) & 1
        ry = (t ^ rx) & 1
        flip = (ry == 0) & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        x += s * rx
        y += s * ry
        t //= 4
        s <<= 1
    return x, y


def hilbert_udf(order: int):
    """(tile_x, tile_y) -> Hilbert d at ``order``, Arrow-batched."""
    order = _check_order(order)

    @F.pandas_udf(LongType())
    def _enc(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(
            xy2d(x.to_numpy(np.int64), y.to_numpy(np.int64), order)
        )

    return _enc


def with_hilbert(
    df: DataFrame,
    x_col: str = "tile_x",
    y_col: str = "tile_y",
    order: int | None = None,
    zoom: int | None = None,
    out: str = "hilbert",
) -> DataFrame:
    """Add the Hilbert curve position of integer tile coords. ``order``
    defaults to ``zoom`` (they are the same quantity for slippy tiles —
    pass one of them)."""
    o = order if order is not None else zoom
    if o is None:
        raise ValueError("pass order= (or zoom=)")
    return df.withColumn(out, hilbert_udf(o)(F.col(x_col), F.col(y_col)))


def cluster_by_hilbert(
    df: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    zoom: int = 12,
    n_partitions: int = 32,
    out: str = "hilbert",
) -> DataFrame:
    """Range-partition + sort by Hilbert position for spatial data
    skipping — same contract as zorder.cluster_by_zorder / cluster_by_s2
    / cluster_by_quadkey, with the strongest locality of the family:
    every output partition is one contiguous curve run, and curve runs
    are connected regions (no Z-seam teleports), so bbox predicates
    touch the fewest row groups. The curve column is KEPT (pushdown
    needs a stored column)."""
    from fairy_core_spark.spatial.webmercator import with_tiles

    tiled = with_tiles(df, zoom=zoom, lat_col=lat_col, lon_col=lon_col, quadkey=False)
    return (
        with_hilbert(tiled, order=zoom, out=out)
        .repartitionByRange(n_partitions, out)
        .sortWithinPartitions(out)
    )


def hilbert_recursive_sql(order: int, src: str, passthrough: str) -> str:
    """DuckDB twin of :func:`xy2d` as a RECURSIVE CTE stepping the bit
    level — per-level state rides in rows (k, x, y, d), so the replay is
    the same fold with no expression blow-up. ``src`` must expose
    integer columns x, y plus ``passthrough``. Embed inside a
    ``WITH RECURSIVE`` clause list; the result relation is
    ``hilbert_done`` with (``passthrough``, d)."""
    order = _check_order(order)
    return f"""hilbert_step({passthrough}, k, x, y, d) AS (
      SELECT {passthrough}, {order - 1}, x, y, CAST(0 AS BIGINT) FROM {src}
      UNION ALL
      SELECT {passthrough}, k - 1,
             CASE WHEN ((y >> k) & 1) = 0
                  THEN CASE WHEN ((x >> k) & 1) = 1
                            THEN (1::BIGINT << k) - 1 - y ELSE y END
                  ELSE x END AS x,
             CASE WHEN ((y >> k) & 1) = 0
                  THEN CASE WHEN ((x >> k) & 1) = 1
                            THEN (1::BIGINT << k) - 1 - x ELSE x END
                  ELSE y END AS y,
             d + (1::BIGINT << k) * (1::BIGINT << k)
               * (xor(3 * ((x >> k) & 1), (y >> k) & 1))
      FROM hilbert_step WHERE k >= 0
    ),
    hilbert_done AS (
      SELECT {passthrough}, d FROM hilbert_step WHERE k = -1
    )"""


# Child transforms of the U-shaped curve, derived from the d2xy fold: the
# quadrant visited at curve position q maps child-local (u, v) in [0,s)^2
# to parent-local coords. Verified against the order-1 base case.
#   q=0: (v, u)             + (0, 0)
#   q=1: (u, v)             + (0, s)
#   q=2: (u, v)             + (s, s)
#   q=3: (s-1-v, s-1-u)     + (s, 0)


def hilbert_ranges_for_bbox(
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
    order: int,
    max_ranges: int = 64,
) -> list[tuple[int, int]]:
    """Merged, sorted curve-position intervals covering EXACTLY the tiles
    of the closed rectangle [x_lo, x_hi] x [y_lo, y_hi] — the Hilbert
    twin of zorder.zranges_for_bbox, by top-down quadrant descent: a
    subtree fully inside the rect emits one interval, a disjoint one is
    skipped, a straddling one recurses with the composed child affine
    map. When splitting would exceed ``max_ranges`` after merging, the
    straddling cells at the current floor are emitted whole instead
    (conservative over-cover, same trade as zrange_filter's depth cap).

    Locality payoff vs Z-order: Hilbert subtree runs are CONNECTED
    squares with no seam teleports, so the same rectangle merges into
    fewer intervals on average (asserted by test battery)."""
    order = _check_order(order)
    n = 1 << order
    if not (0 <= x_lo <= x_hi < n and 0 <= y_lo <= y_hi < n):
        raise ValueError(f"bbox must satisfy 0 <= lo <= hi < 2^{order}")
    out: list[tuple[int, int]] = []

    # affine map M = (a, b, e, c, d, f): global_x = a*u + b*v + e,
    # global_y = c*u + d*v + f  over local (u, v) in [0, size)^2
    def walk(d0: int, size: int, m: tuple[int, ...], budget: list[int]) -> None:
        a, b, e, c, d, f = m
        # global bbox of this cell: evaluate the two extreme corners
        xs = (e, a * (size - 1) + b * (size - 1) + e)
        ys = (f, c * (size - 1) + d * (size - 1) + f)
        cx_lo, cx_hi = min(xs), max(xs)
        cy_lo, cy_hi = min(ys), max(ys)
        if cx_hi < x_lo or cx_lo > x_hi or cy_hi < y_lo or cy_lo > y_hi:
            return
        full = (
            x_lo <= cx_lo and cx_hi <= x_hi and y_lo <= cy_lo and cy_hi <= y_hi
        )
        if full or size == 1 or budget[0] <= 0:
            out.append((d0, d0 + size * size - 1))
            return
        h = size >> 1
        budget[0] -= 3  # a split can grow the interval count by <= 3
        for q, (qa, qb, qe, qc, qd, qf) in enumerate(
            (
                (0, 1, 0, 1, 0, 0),          # (v, u)
                (1, 0, 0, 0, 1, h),          # (u, v) + (0, h)
                (1, 0, h, 0, 1, h),          # (u, v) + (h, h)
                (0, -1, 2 * h - 1, -1, 0, h - 1),  # (h-1-v, h-1-u) + (h, 0)
            )
        ):
            cm = (
                a * qa + b * qc,
                a * qb + b * qd,
                a * qe + b * qf + e,
                c * qa + d * qc,
                c * qb + d * qd,
                c * qe + d * qf + f,
            )
            walk(d0 + q * h * h, h, cm, budget)

    walk(0, n, (1, 0, 0, 0, 1, 0), [max(int(max_ranges), 1) * 4])
    out.sort()
    merged = [list(out[0])]
    for lo, hi in out[1:]:
        if lo <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    # enforce the predicate-size contract exactly: bridge the SMALLEST
    # inter-interval gaps (conservative over-cover) until <= max_ranges
    if len(merged) > max_ranges:
        gaps = sorted(
            range(1, len(merged)),
            key=lambda i: merged[i][0] - merged[i - 1][1],
        )
        bridge = set(gaps[: len(merged) - max_ranges])
        fused: list[list[int]] = []
        for i, (lo, hi) in enumerate(merged):
            if i in bridge:
                fused[-1][1] = hi
            else:
                fused.append([lo, hi])
        merged = fused
    return [(lo, hi) for lo, hi in merged]


def hilbert_range_filter(
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
    order: int,
    curve_col: str = "hilbert",
    max_ranges: int = 64,
) -> Column:
    """Pushdown-able scan predicate over a stored Hilbert column: OR of
    BETWEENs from :func:`hilbert_ranges_for_bbox` — parquet footer
    min/max prunes row groups on a cluster_by_hilbert layout (same
    contract as zorder.zrange_filter / s2_range_filter /
    quadkey_range_filter; conservative — refine on raw coords)."""
    ranges = hilbert_ranges_for_bbox(x_lo, x_hi, y_lo, y_hi, order, max_ranges)
    col = F.col(curve_col)
    pred = col.between(ranges[0][0], ranges[0][1])
    for lo, hi in ranges[1:]:
        pred = pred | col.between(lo, hi)
    return pred
