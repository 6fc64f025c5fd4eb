"""Z-order (Morton) curve + geohash encoding as pure JVM Column bit math.

Complements the S2 index (`spatial/s2.py`, Arrow pandas_udf): this cell
scheme has NO Python anywhere — quantize, bit-spread, interleave, and
base32-map are all native Column expressions inside whole-stage codegen,
so encode costs one projection and the exact same arithmetic can be
replayed bit-for-bit by any SQL engine (the DuckDB driver oracle runs the
identical shifts/masks — see `queries.py:spatial_zorder_encode`).

Semantics (published algorithms, no reference impl — the reference has no
spatial code; north-rule component):

- **Morton code**: lat and lon are quantized to ``bits``-bit integers by
  binary subdivision of [-90, 90] / [-180, 180] (``u = floor((v - lo) /
  range * 2^bits)``, clamped), then bit-interleaved lon-first via the
  standard magic-number spread (Morton 1966; the "Interleave bits by
  Binary Magic Numbers" method from the public Bit Twiddling Hacks
  collection). With bits=30 the code occupies 60 bits — it fits int64 and
  matches geohash's per-axis resolution at precision 12.
- **Geohash**: the classic public base32 encoding (Niemeyer 2008) is the
  same interleaved subdivision read 5 bits at a time, so it is derived
  from the Morton code directly: char k = alphabet[(z >> (5*(p-1-k))*...)]
  — bit-exact with the published algorithm up to its full 12-char
  precision (60 bits: 30 lon + 30 lat), pinned by the published test
  vector (57.64911, 10.40744) -> "u4pruydqqvj" in tests/test_zorder.py.

Why this matters at 100 TB: Z-order is the locality key for **spatial
data skipping**. `cluster_by_zorder` range-partitions and sorts by the
Morton code so every parquet row group covers a tight lat/lon rectangle;
min/max footer stats then prune bbox queries at the scan (the same
technique as Delta/Iceberg Z-ordering, here as a first-class operator).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"

# Binary-magic-number spread masks (public domain, Bit Twiddling Hacks):
# after step i, the value's bits sit in groups separated by gaps that the
# next shift-or fills; the final mask leaves one source bit per even slot.
_SPREAD = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _quantize(v: Column, lo: float, rng: float, bits: int) -> Column:
    """Binary-subdivision quantizer: floor((v-lo)/rng * 2^bits), clamped.

    The clamp keeps the north-pole / antimeridian edge (v == hi) in the
    last cell instead of overflowing to 2^bits.
    """
    u = F.floor((v - F.lit(float(lo))) / F.lit(float(rng)) * F.lit(float(2**bits)))
    return F.least(F.greatest(u, F.lit(0)), F.lit(2**bits - 1)).cast("long")


def _spread_bits(u: Column) -> Column:
    """Spread an int's low 32 bits to even positions (Morton interleave)."""
    for shift, mask in _SPREAD:
        u = (u.bitwiseOR(F.shiftleft(u, shift))).bitwiseAND(F.lit(mask))
    return u


_COMPACT = (
    (1, 0x3333333333333333),
    (2, 0x0F0F0F0F0F0F0F0F),
    (4, 0x00FF00FF00FF00FF),
    (8, 0x0000FFFF0000FFFF),
    (16, 0x00000000FFFFFFFF),
)


def _compact_bits(z: Column) -> Column:
    """Inverse of _spread_bits: gather even-position bits back together."""
    z = z.bitwiseAND(F.lit(0x5555555555555555))
    for shift, mask in _COMPACT:
        z = (z.bitwiseOR(F.shiftright(z, shift))).bitwiseAND(F.lit(mask))
    return z


def morton_code(lat: Column, lon: Column, bits: int = 30) -> Column:
    """lon-first bit-interleaved Z-order code (2*bits total bits, int64).

    bits <= 31; the default 30 gives the 60-bit code whose 5-bit groups
    ARE the geohash character stream.
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    u_lat = _quantize(lat, -90.0, 180.0, bits)
    u_lon = _quantize(lon, -180.0, 360.0, bits)
    return F.shiftleft(_spread_bits(u_lon), 1).bitwiseOR(_spread_bits(u_lat))


def morton_decode(z: Column, bits: int = 30) -> tuple[Column, Column]:
    """Z-order code -> (lat, lon) of the CELL CENTER (lossy by cell size)."""
    u_lat = _compact_bits(z)
    u_lon = _compact_bits(F.shiftright(z, 1))
    scale = float(2**bits)
    lat = (u_lat.cast("double") + F.lit(0.5)) / F.lit(scale) * F.lit(180.0) - F.lit(90.0)
    lon = (u_lon.cast("double") + F.lit(0.5)) / F.lit(scale) * F.lit(360.0) - F.lit(180.0)
    return lat, lon


def geohash_col(lat: Column, lon: Column, precision: int = 8) -> Column:
    """Classic geohash string (1..12 chars), derived from the Morton code.

    Char k encodes interleaved bits [59-5k .. 55-5k] of the 60-bit
    lon-first code — exactly the published subdivision algorithm.
    """
    if not 1 <= precision <= 12:
        raise ValueError(f"precision must be in [1, 12], got {precision}")
    z = morton_code(lat, lon, bits=30)
    alphabet = F.array(*[F.lit(c) for c in GEOHASH_B32])
    chars = [
        F.element_at(
            alphabet,
            (F.shiftright(z, 55 - 5 * k).bitwiseAND(F.lit(31)) + F.lit(1)).cast("int"),
        )
        for k in range(precision)
    ]
    return F.concat(*chars)


def with_zorder(df: DataFrame, lat_col: str = "lat", lon_col: str = "lon",
                bits: int = 30, out: str = "zcode") -> DataFrame:
    return df.withColumn(out, morton_code(F.col(lat_col), F.col(lon_col), bits))


def zranges_for_bbox(lat0: float, lat1: float, lon0: float, lon1: float,
                     bits: int = 30, max_ranges: int = 64) -> list[tuple[int, int]]:
    """Decompose a lat/lon bbox into <= max_ranges contiguous Z-code
    ranges (quadtree prefix cover — the same idea as an S2 cell covering,
    on the Morton curve).

    Driver-side pure Python over at most ~4*max_ranges quadtree nodes —
    O(max_ranges), independent of data size. The ranges are disjoint,
    sorted, and their union contains every code whose CELL intersects the
    bbox (a superset of the exact point set — pair with the exact lat/lon
    predicate for refinement; the ranges only exist to prune the scan).
    """
    if lat1 < lat0 or lon1 < lon0:
        raise ValueError("bbox must satisfy lat0 <= lat1 and lon0 <= lon1")

    def q(v, lo, rng):
        import math

        return min(max(int(math.floor((v - lo) / rng * 2**bits)), 0), 2**bits - 1)

    a0, a1 = q(lat0, -90.0, 180.0), q(lat1, -90.0, 180.0)
    b0, b1 = q(lon0, -180.0, 360.0), q(lon1, -180.0, 360.0)

    # BFS over quadtree nodes (depth d: cell = 2^(bits-d) quantized units
    # per axis); a node fully inside the quantized bbox contributes its
    # whole contiguous Z-interval, a disjoint node nothing, a straddling
    # node recurses until the budget forces it to be taken whole.
    out: list[tuple[int, int]] = []
    frontier: list[tuple[int, int, int]] = [(0, 0, 0)]  # (depth, ulat_pfx, ulon_pfx)
    while frontier:
        depth, pa, pb = frontier.pop()
        side = 1 << (bits - depth)
        la, lb = pa * side, pb * side
        ha, hb = la + side - 1, lb + side - 1
        if ha < a0 or la > a1 or hb < b0 or lb > b1:
            continue
        # node's Z-interval is contiguous: prefix interleave << 2*(bits-depth)
        z_lo = _py_interleave(pa, pb, depth) << (2 * (bits - depth))
        z_hi = z_lo + (1 << (2 * (bits - depth))) - 1
        full = la >= a0 and ha <= a1 and lb >= b0 and hb <= b1
        # budget check counts the 4 children this node would push (the
        # popped node is no longer in frontier): recursing is only allowed
        # if out+frontier+4 still fits, which keeps the invariant
        # len(out)+len(frontier) <= max_ranges at every step — the old
        # >=max_ranges check allowed overshoot to max_ranges+3
        if full or depth == bits or len(out) + len(frontier) + 4 > max_ranges:
            out.append((z_lo, z_hi))
            continue
        for da in (0, 1):
            for db in (0, 1):
                frontier.append((depth + 1, pa * 2 + da, pb * 2 + db))
    out.sort()
    merged = [list(out[0])]
    for lo, hi in out[1:]:
        if lo == merged[-1][1] + 1:
            merged[-1][1] = hi
        else:
            merged.append([lo, hi])
    return [(lo, hi) for lo, hi in merged]


def _py_interleave(ulat_prefix: int, ulon_prefix: int, depth: int) -> int:
    z = 0
    for i in range(depth):
        z |= ((ulat_prefix >> i) & 1) << (2 * i)
        z |= ((ulon_prefix >> i) & 1) << (2 * i + 1)
    return z


def zrange_filter(lat0: float, lat1: float, lon0: float, lon1: float,
                  zcode_col: str = "zcode", bits: int = 30,
                  max_ranges: int = 64) -> Column:
    """Pushdown-able scan predicate for a bbox over a Z-coded table.

    `OR` of BETWEENs on the (sorted, min/max-indexed) code column — on a
    `cluster_by_zorder` layout each BETWEEN prunes whole files/row groups
    via parquet footer stats before any row is read. Combine with the
    exact lat/lon predicate (this cover is a cell-granular superset).

    Target a STORED code column (`cluster_by_zorder` keeps one as
    ``zcode``): pushdown requires it, and filtering an inline-computed
    code duplicates the bit-math expression per comparison (see
    `cluster_by_zorder`'s docstring).
    """
    ranges = zranges_for_bbox(lat0, lat1, lon0, lon1, bits, max_ranges)
    z = F.col(zcode_col)
    pred = z.between(F.lit(ranges[0][0]), F.lit(ranges[0][1]))
    for lo, hi in ranges[1:]:
        pred = pred | z.between(F.lit(lo), F.lit(hi))
    return pred


def cluster_by_zorder(df: DataFrame, lat_col: str = "lat", lon_col: str = "lon",
                      n_partitions: int = 32, bits: int = 30,
                      code_col: str | None = "zcode") -> DataFrame:
    """Range-partition + sort by Morton code for spatial data skipping.

    Every output partition (-> parquet file / row group) covers a
    contiguous Z-range, i.e. a tight lat/lon footprint; bbox filters on a
    downstream scan then prune via footer min/max stats without reading
    data. `repartitionByRange` samples the code distribution, so skewed
    point sets (hot cities) still yield balanced partitions — the operator
    is the batch-layout answer to the same skew the runtime handles with
    AQE + salting.

    ``code_col``: name under which the Morton code is KEPT in the output
    (default ``"zcode"``). Keeping it is load-bearing for data skipping:
    `zrange_filter` predicates push to the parquet scan only against a
    *stored* column — filtering an inline-computed code makes Catalyst
    re-inline the bit math per comparison (no pushdown, and >32 ranges
    can overflow the 64 KB codegen method limit into interpreted
    fallback). Pass ``code_col=None`` to drop it.
    """
    zcol = morton_code(F.col(lat_col), F.col(lon_col), bits)
    keep = code_col or "__z"
    out = (
        df.withColumn(keep, zcol)
        .repartitionByRange(n_partitions, keep)
        .sortWithinPartitions(keep)
    )
    return out if code_col else out.drop(keep)
