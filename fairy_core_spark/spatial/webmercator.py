"""Web-Mercator XYZ tiles + quadkeys (the slippy-map scheme) as pure
Column math.

The third cell scheme next to hex7 (`spatial/hex7.py`) and S2/Z-order
(`spatial/s2.py`, `spatial/zorder.py`): the de-facto standard for
*serving* raster imagery — every web map addresses tiles as
``z/x/y.png`` — so a 100 TB image corpus keyed by these tiles can be
joined directly against tile-addressed storage layouts and CDN logs.
Semantics are the published slippy-map / Bing-quadkey algorithms
(OpenStreetMap wiki "Slippy map tilenames"; Schwartz, "Bing Maps Tile
System"), no reference impl — the reference has no spatial code
(north-rule component).

- **tile x**: ``floor((lon + 180) / 360 * 2^z)``, clamped to
  ``[0, 2^z - 1]`` (lon = +180 maps to the last column, not a wrap).
- **tile y**: latitude clamped to +-85.05112878 (the Web-Mercator square
  limit, where ``|mercator y| = pi``), then
  ``floor((1 - ln(tan(phi) + sec(phi)) / pi) / 2 * 2^z)``, clamped.
- **quadkey**: zoom digits, MSB-first; digit k = 2*y_bit + x_bit —
  base-4 string whose *prefix* is the parent tile at every coarser zoom,
  so prefix filters give multi-resolution pruning for free.

Everything is native Column arithmetic inside whole-stage codegen — no
Python, no UDF. The x path is exact rational arithmetic (identical
doubles in any IEEE engine); the y path crosses ``tan``/``ln``/``cos``
whose last-ulp rounding may differ between libm implementations, so the
driver oracle's cross-engine equality is additionally pinned empirically
at sf 0.001/0.01/0.1 (boundary-hitting would need a point within ulps of
an irrational tile edge).

At 100 TB: `with_tiles` is one projection; rollups shuffle 2 int64s +
one short string per row. Range pruning works on raw (x, y) min/max
footer stats when data is written sorted by quadkey (`bbox_tile_filter`
emits a closed x/y rectangle predicate, sargable by parquet).
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# standard Web-Mercator latitude clamp: atan(sinh(pi)) in degrees
MAX_LAT = 85.05112878

# explicit degree->radian multiply instead of radians()/Math.toRadians:
# engines disagree in the last ulp between x*(pi/180) and x/180*pi, so
# every twin (Column, SQL oracle, py_tile) multiplies by this one double
_DEG2RAD = math.pi / 180.0

MAX_ZOOM = 23  # 2 * 23 bits + quadkey string stay cheap; zoom 23 ~ 5 m/px


def _check_zoom(zoom: int) -> int:
    if not (0 <= int(zoom) <= MAX_ZOOM):
        raise ValueError(f"zoom must be in [0, {MAX_ZOOM}], got {zoom}")
    return int(zoom)


def tile_x_col(lon: Column, zoom: int) -> Column:
    """Slippy-map tile column index at ``zoom`` — exact rational math."""
    n = 1 << _check_zoom(zoom)
    raw = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1)).cast("long")


def tile_y_col(lat: Column, zoom: int) -> Column:
    """Slippy-map tile row index at ``zoom`` (0 = north edge)."""
    n = 1 << _check_zoom(zoom)
    phi = F.least(F.greatest(lat, F.lit(-MAX_LAT)), F.lit(MAX_LAT)) * F.lit(_DEG2RAD)
    merc = (
        F.lit(1.0) - F.log(F.tan(phi) + F.lit(1.0) / F.cos(phi)) / F.lit(math.pi)
    ) / F.lit(2.0)
    raw = F.floor(merc * F.lit(float(n)))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1)).cast("long")


def quadkey_col(x: Column, y: Column, zoom: int) -> Column:
    """Bing-style base-4 quadkey string (length = zoom; '' at zoom 0).
    Parent at zoom-1 == substring(qk, 1, zoom-1): prefix = containment."""
    zoom = _check_zoom(zoom)
    digits = [
        (
            F.shiftright(y, bit).bitwiseAND(F.lit(1)) * F.lit(2)
            + F.shiftright(x, bit).bitwiseAND(F.lit(1))
        ).cast("string")
        for bit in range(zoom - 1, -1, -1)
    ]
    return F.concat(*digits) if digits else F.lit("")


def parent_tile(x: Column, y: Column) -> tuple[Column, Column]:
    """(x, y) of the containing tile one zoom coarser — pure bit math."""
    return F.shiftright(x, 1), F.shiftright(y, 1)


def with_tiles(
    df: DataFrame,
    zoom: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
    prefix: str = "tile_",
    quadkey: bool = True,
) -> DataFrame:
    """Add ``{prefix}x``, ``{prefix}y`` (and ``quadkey``) columns — one
    codegen projection, no shuffle."""
    x = tile_x_col(F.col(lon_col), zoom)
    y = tile_y_col(F.col(lat_col), zoom)
    out = df.withColumn(f"{prefix}x", x).withColumn(f"{prefix}y", y)
    if quadkey:
        out = out.withColumn(
            "quadkey", quadkey_col(F.col(f"{prefix}x"), F.col(f"{prefix}y"), zoom)
        )
    return out


def pyramid(
    df: DataFrame,
    quadkey_col: str = "quadkey",
    zooms: tuple[int, ...] = (12, 8, 4),
) -> DataFrame:
    """Web-Mercator member of the pyramid trio (hex7_ops.hex7_pyramid,
    ops.s2_pyramid): explode each row to every zoom as ``(res, cell)``
    where ``cell`` is the quadkey PREFIX at that zoom — containment =
    prefix, so the parent function is a substring, evaluated through the
    same single codegen Generate(stack) (one shuffle for the whole
    pyramid). Input quadkeys must be at ``max(zooms)``. cell is the
    base-4 string (the interchange form); shuffle-size-sensitive callers
    can map it to the equivalent int64 Morton code — same digits, base 4.
    """
    from fairy_core_spark.spatial.hex7_ops import pyramid_stack

    lvls = sorted({int(z) for z in zooms}, reverse=True)
    if not lvls or lvls[-1] < 0 or lvls[0] > MAX_ZOOM:
        raise ValueError(f"zooms must be non-empty, all in [0, {MAX_ZOOM}], got {zooms}")
    # fail loudly on quadkeys not at the base zoom — a shorter key would
    # silently alias a coarser tile into every level's rollup
    base = lvls[0]
    guarded = df.withColumn(
        quadkey_col,
        F.when(F.length(F.col(quadkey_col)) == base, F.col(quadkey_col)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"pyramid: quadkey not at base zoom {base}: '"),
                    F.col(quadkey_col),
                    F.lit("'"),
                )
            )
        ),
    )
    return pyramid_stack(
        guarded, quadkey_col, lvls, lambda c, z: F.substring(c, 1, z)
    )


def py_tile(lat: float, lon: float, zoom: int) -> tuple[int, int]:
    """Driver-side scalar twin of (tile_x_col, tile_y_col) — same formula,
    used for bbox bounds and by tests as the independent reference."""
    n = 1 << _check_zoom(zoom)
    x = int(math.floor((lon + 180.0) / 360.0 * float(n)))
    latc = min(max(lat, -MAX_LAT), MAX_LAT)
    phi = latc * _DEG2RAD
    merc = (1.0 - math.log(math.tan(phi) + 1.0 / math.cos(phi)) / math.pi) / 2.0
    y = int(math.floor(merc * float(n)))
    return min(max(x, 0), n - 1), min(max(y, 0), n - 1)


def _py_quadkey_int(x: int, y: int, zoom: int) -> int:
    """Quadkey as the equivalent integer Morton code (digit k = 2*y_bit
    + x_bit, MSB first) — the numeric twin of quadkey_col used for range
    merging."""
    q = 0
    for bit in range(zoom - 1, -1, -1):
        q = (q << 2) | (((y >> bit) & 1) << 1) | ((x >> bit) & 1)
    return q


def _int_to_quadkey(q: int, zoom: int) -> str:
    return "".join(str((q >> (2 * (zoom - 1 - i))) & 3) for i in range(zoom))


def cluster_by_quadkey(
    df: DataFrame,
    zoom: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
    n_partitions: int = 32,
    qk_col: str = "quadkey",
) -> DataFrame:
    """Range-partition + sort by quadkey for spatial data skipping — the
    webmercator member of the clustered-layout family (cluster_by_zorder
    / cluster_by_s2 / cluster_by_hex7). Quadkey order IS Morton order
    over (y, x) (fixed-length base-4 strings compare numerically), so
    every output partition covers a compact tile range and footer
    min/max stats on the STORED quadkey column prune bbox scans
    (`quadkey_range_filter`). repartitionByRange samples the key
    distribution, so hot-city skew still yields balanced partitions."""
    x = tile_x_col(F.col(lon_col), zoom)
    y = tile_y_col(F.col(lat_col), zoom)
    return (
        df.withColumn(qk_col, quadkey_col(x, y, zoom))
        .repartitionByRange(n_partitions, qk_col)
        .sortWithinPartitions(qk_col)
    )


def quadkey_range_filter(
    lat0: float,
    lat1: float,
    lon0: float,
    lon1: float,
    zoom: int,
    cover_zoom: int | None = None,
    qk_col: str = "quadkey",
    max_cover_tiles: int = 4096,
) -> Column:
    """Merged OR-of-BETWEENs on a stored zoom-``zoom`` quadkey column
    covering the bbox — the quadkey twin of ``zorder.zrange_filter`` /
    ``ops.s2_range_filter``. The bbox's tile rectangle at ``cover_zoom``
    becomes Morton codes; contiguous runs merge into one BETWEEN each
    (descendant ranges are quadkey-prefix ranges, exact by construction).
    Conservative: keeps every row whose cover tile intersects the bbox;
    callers refine on raw lat/lon. ``cover_zoom`` defaults to the finest
    zoom whose cover stays under ``max_cover_tiles`` (predicate size is
    what bounds codegen, same trade as zrange_filter's depth)."""
    if lat1 < lat0 or lon1 < lon0:
        raise ValueError("bbox must satisfy lat0 <= lat1 and lon0 <= lon1")
    zoom = _check_zoom(zoom)
    if cover_zoom is None:
        cover_zoom = zoom
        while cover_zoom > 0:
            x_lo, y_lo = py_tile(lat1, lon0, cover_zoom)
            x_hi, y_hi = py_tile(lat0, lon1, cover_zoom)
            if (x_hi - x_lo + 1) * (y_hi - y_lo + 1) <= max_cover_tiles:
                break
            cover_zoom -= 1
    cover_zoom = int(cover_zoom)
    if not 0 <= cover_zoom <= zoom:
        raise ValueError(f"cover_zoom must be in [0, zoom={zoom}], got {cover_zoom}")
    x_lo, y_lo = py_tile(lat1, lon0, cover_zoom)  # north-west corner
    x_hi, y_hi = py_tile(lat0, lon1, cover_zoom)  # south-east corner
    codes = sorted(
        _py_quadkey_int(x, y, cover_zoom)
        for x in range(x_lo, x_hi + 1)
        for y in range(y_lo, y_hi + 1)
    )
    # merge contiguous Morton runs -> one BETWEEN per run
    runs: list[list[int]] = []
    for c in codes:
        if runs and c == runs[-1][1] + 1:
            runs[-1][1] = c
        else:
            runs.append([c, c])
    span = zoom - cover_zoom
    pred = None
    for lo, hi in runs:
        lo_qk = _int_to_quadkey(lo << (2 * span), zoom)
        hi_qk = _int_to_quadkey(((hi + 1) << (2 * span)) - 1, zoom)
        p = F.col(qk_col).between(lo_qk, hi_qk)
        pred = p if pred is None else (pred | p)
    return pred


def bbox_tile_filter(
    lat0: float,
    lat1: float,
    lon0: float,
    lon1: float,
    zoom: int,
    x_col: str = "tile_x",
    y_col: str = "tile_y",
) -> Column:
    """Closed-rectangle tile predicate covering the bbox at ``zoom`` —
    two BETWEENs on int64 columns, sargable by parquet min/max footer
    stats (y grows southward, so lat1/lat0 swap). Conservative: keeps
    every tile that intersects the bbox; callers refine on raw lat/lon.
    No antimeridian wrap (same contract as zorder.zranges_for_bbox)."""
    if lat1 < lat0 or lon1 < lon0:
        raise ValueError("bbox must satisfy lat0 <= lat1 and lon0 <= lon1")
    x_lo, y_lo = py_tile(lat1, lon0, zoom)  # north-west corner
    x_hi, y_hi = py_tile(lat0, lon1, zoom)  # south-east corner
    return F.col(x_col).between(x_lo, x_hi) & F.col(y_col).between(y_lo, y_hi)


def bbox_tile_filter_wrapped(
    lat0: float,
    lat1: float,
    lon_w: float,
    lon_e: float,
    zoom: int,
    x_col: str = "tile_x",
    y_col: str = "tile_y",
) -> Column:
    """Antimeridian-aware viewport predicate — the Pacific-map case every
    non-wrapping bbox op in this repo (bbox_tile_filter,
    zorder.zranges_for_bbox, hex7.polyfill) explicitly refuses.

    ``lon_w``/``lon_e`` are the WEST and EAST edges walking eastward:
    ``lon_w <= lon_e`` is an ordinary bbox (delegates verbatim);
    ``lon_w > lon_e`` crosses the dateline and splits into the union of
    two closed rectangles, ``[lon_w, 180] OR [-180, lon_e]`` — still a
    pure tile-space predicate (four int64 BETWEENs), still sargable: on
    a quadkey/Z-clustered layout each half prunes its own row-group
    range, and the OR of two sargable ranges stays footer-prunable.
    Same conservative contract as bbox_tile_filter: keeps every tile
    that intersects either half; callers refine on raw lat/lon."""
    if lon_w <= lon_e:
        return bbox_tile_filter(lat0, lat1, lon_w, lon_e, zoom, x_col, y_col)
    west_half = bbox_tile_filter(lat0, lat1, lon_w, 180.0, zoom, x_col, y_col)
    east_half = bbox_tile_filter(lat0, lat1, -180.0, lon_e, zoom, x_col, y_col)
    return west_half | east_half


def zonal_tile_stats(
    tiled: DataFrame,
    zones: Sequence[tuple[str, float, float, float, float]],
    zoom: int,
    x_col: str = "tile_x",
    y_col: str = "tile_y",
    weight_col: str | None = None,
) -> DataFrame:
    """Zonal statistics in TILE space — the raster half of raster<->vector
    zonal stats (north-rule op; the reference has no spatial code): per
    zone, how many tiles of the conservative bbox cover are occupied and
    how much mass (point count / integral weight) they hold.

    ``zones`` is a broadcast-scale driver-side list of
    ``(zone_id, lat0, lat1, lon0, lon1)`` bboxes (split arbitrary
    polygons into their bbox cover first; refine on raw lat/lon where
    exactness beyond the cover matters — same conservative contract as
    bbox_tile_filter). Each bbox becomes a CLOSED tile rectangle via the
    same py_tile corner math bbox_tile_filter uses, so the whole
    assignment is integer BETWEENs — no floating geometry at run time,
    and zones may overlap (a tile contributes to every zone covering it).

    Emits per zone_id: ``n_tiles`` (occupied tiles in the rectangle),
    ``n_points`` (their total count / weight sum). Zones covering no
    occupied tile emit (0, 0) — the left join keeps every zone, so a
    monitoring dashboard never drops a silent region.

    Plan (the 100 TB story): points collapse to the occupied-tile frame
    first (ONE map-side-combined groupBy, bounded by 4**zoom); the
    zone assignment is a broadcast range join against the tiny zone
    rectangle table (BroadcastNestedLoopJoin over <=thousands of zones —
    each occupied tile tests |zones| int64 comparisons in codegen);
    the final per-zone rollup is a second combined groupBy over
    (zone_id, partials). Points never shuffle; only (x, y, n) triples do.
    """
    if not zones:
        raise ValueError("zones must be non-empty")
    zoom = _check_zoom(zoom)
    from fairy_core_spark.spatial.ops import mass_col

    counts = tiled.groupBy(x_col, y_col).agg(
        mass_col(weight_col).cast("long").alias("n")
    )

    rows = []
    for zone_id, lat0, lat1, lon0, lon1 in zones:
        if lat1 < lat0 or lon1 < lon0:
            raise ValueError(f"zone {zone_id!r}: bbox must satisfy lat0 <= lat1, lon0 <= lon1")
        x_lo, y_lo = py_tile(lat1, lon0, zoom)  # north-west corner
        x_hi, y_hi = py_tile(lat0, lon1, zoom)  # south-east corner
        rows.append((str(zone_id), x_lo, x_hi, y_lo, y_hi))
    ids = [r[0] for r in rows]
    if len(set(ids)) != len(ids):
        dup = sorted({i for i in ids if ids.count(i) > 1})
        # the per-zone groupBy would MERGE duplicate ids' rectangles into
        # one combined row and then emit it once per zdf row — neither
        # rectangle's true stats recoverable; note str() coercion (1 vs
        # '1' collide)
        raise ValueError(f"duplicate zone_id(s) after str() coercion: {dup}")
    spark = tiled.sparkSession
    zdf = spark.createDataFrame(
        rows, "zone_id string, x_lo long, x_hi long, y_lo long, y_hi long"
    )
    # INNER join with the zone table as the broadcast BUILD side — a left
    # outer join here could only broadcast the right side, which would
    # ship the occupied-tile frame (large at deep zooms) to every
    # executor; empty zones are restored afterwards by a left join
    # between two zone-cardinality frames (both tiny).
    joined = counts.join(
        F.broadcast(zdf),
        F.col(x_col).between(F.col("x_lo"), F.col("x_hi"))
        & F.col(y_col).between(F.col("y_lo"), F.col("y_hi")),
    )
    per_zone = joined.groupBy("zone_id").agg(
        F.count(F.lit(1)).alias("n_tiles"),
        F.sum("n").cast("long").alias("n_points"),
    )
    return zdf.select("zone_id").join(per_zone, "zone_id", "left").select(
        "zone_id",
        F.coalesce(F.col("n_tiles"), F.lit(0)).cast("long").alias("n_tiles"),
        F.coalesce(F.col("n_points"), F.lit(0)).cast("long").alias("n_points"),
    )


def adaptive_tiles(
    tiled: DataFrame,
    zmin: int,
    zmax: int,
    max_count: int,
    quadkey_col: str = "quadkey",
    weight_col: str | None = None,
) -> DataFrame:
    """Adaptive quadtree tiling — split a tile while it holds more than
    ``max_count`` points, down to ``zmax`` (north-rule raster op; the
    data-driven analog of hex7/H3 ``compact``: dense regions get deep
    tiles, oceans stay coarse, so a skewed planet-scale corpus is
    covered by a prefix-free tile set orders of magnitude smaller than
    the uniform finest grid).

    Input rows carry a base-zoom quadkey (``quadkey_col`` at ``zmax``,
    e.g. from with_tiles). A node (zoom z, prefix p) of the implicit
    quadtree is EMITTED iff
    - ``cnt(p) <= max_count`` and (``z == zmin`` or the parent is over
      the cap) — the first qualifying level on its chain, or
    - ``z == zmax`` and ``cnt(p) > max_count`` — an unsplittable hot
      leaf, emitted as-is (flagged ``is_hot_leaf = 1``).

    The emitted set is PREFIX-FREE and PARTITIONS the input: every
    point lies under exactly one emitted tile, so emitted ``n_points``
    sums to the total (both pinned by property tests). Output:
    ``(zoom, cell, n_points, is_hot_leaf)`` where cell is the quadkey
    prefix.

    Plan (the 100 TB story): raw rows collapse to the finest-tile frame
    ONCE (map-side-combined groupBy, the only shuffle that sees row
    count); per-level node counts come from exploding that SMALL frame
    through one codegen Generate(stack) into a second combined groupBy;
    the parent-count test is a self equi-join of the node frame on the
    parent prefix (substring — pure codegen). Nothing ever walks chains
    per point, and no level rescans the input.
    """
    zmin, zmax = _check_zoom(zmin), _check_zoom(zmax)
    if zmin > zmax:
        raise ValueError(f"zmin must be <= zmax, got {zmin} > {zmax}")
    if max_count < 1:
        raise ValueError(f"max_count must be >= 1, got {max_count}")
    from fairy_core_spark.spatial.ops import mass_col

    finest = tiled.groupBy(F.col(quadkey_col).alias("qk")).agg(
        mass_col(weight_col).cast("long").alias("n")
    )
    # pyramid() carries the not-at-base-zoom raise_error guard and the
    # substring-prefix Generate(stack) — one copy for every quadkey
    # explode (this, pyramid gate entries, streaming tiles)
    nodes = (
        pyramid(finest, quadkey_col="qk", zooms=tuple(range(zmin, zmax + 1)))
        .groupBy("res", "cell")
        .agg(F.sum("n").alias("n_points"))
    )
    parents = nodes.select(
        F.col("cell").alias("pcell"), F.col("n_points").alias("pn")
    )
    withp = nodes.join(
        parents,
        F.substring(F.col("cell"), 1, F.length(F.col("cell")) - 1)
        == F.col("pcell"),
        "left",
    )
    first_fit = (F.col("n_points") <= max_count) & (
        (F.col("res") == zmin) | (F.col("pn") > max_count)
    )
    hot_leaf = (F.col("res") == zmax) & (F.col("n_points") > max_count)
    return withp.where(first_fit | hot_leaf).select(
        F.col("res").cast("long").alias("zoom"),
        "cell",
        "n_points",
        hot_leaf.cast("long").alias("is_hot_leaf"),
    )


def rasterize_segments(
    segments: DataFrame,
    zoom: int,
    id_col: str = "seg_id",
    lat0_col: str = "lat0",
    lon0_col: str = "lon0",
    lat1_col: str = "lat1",
    lon1_col: str = "lon1",
) -> DataFrame:
    """Vector->raster for LINES: every segment becomes the set of tiles
    its digital line passes through — the road/trajectory complement of
    point tiling, behind road-density rasters, coverage maps, and
    tile-indexed segment lookup.

    The walk is the classic DDA digital line in tile space: endpoints
    snap to tiles through the shared slippy-map formulas, then the
    major axis is sampled at ``n = max(|dx|, |dy|)`` unit steps and the
    minor axis rounds half-up: ``coord = c0 + floor((2*d*t + n) /
    (2*n))``. Consecutive tiles differ by at most 1 per axis — an
    8-connected digital line (Bresenham-class; NOT the supercover: a
    line clipping a tile corner between samples may skip it, the
    standard DDA trade). The rounding is engine-exact: numerator and
    denominator are small int64s, the double quotient is >= 2^-21 away
    from any integer it doesn't hit exactly, so FLOOR never flaps.

    Output: DISTINCT ``(id, tile_x, tile_y)`` pairs.

    Plan (the 100 TB story): pure whole-stage-codegen Column math — one
    ``sequence``/``explode`` per segment sized by its tile-space length
    (bounded by the zoom grid, not the dataset), one dropDuplicates on
    (id, x, y) for the rare diagonal double-hit. No Python, no joins;
    parallelism follows the segment scan.
    """
    x0 = tile_x_col(F.col(lon0_col), zoom)
    y0 = tile_y_col(F.col(lat0_col), zoom)
    x1 = tile_x_col(F.col(lon1_col), zoom)
    y1 = tile_y_col(F.col(lat1_col), zoom)
    base = segments.select(
        F.col(id_col),
        x0.alias("_x0"),
        y0.alias("_y0"),
        (x1 - x0).alias("_dx"),
        (y1 - y0).alias("_dy"),
    ).withColumn("_n", F.greatest(F.abs(F.col("_dx")), F.abs(F.col("_dy"))))

    def _step(c0: str, d: str) -> Column:
        return F.col(c0) + F.floor(
            (2 * F.col(d) * F.col("_t") + F.col("_n"))
            / (2 * F.col("_n"))
        ).cast("long")

    walked = (
        base.where(F.col("_n") > 0)
        .select(id_col, "_x0", "_y0", "_dx", "_dy", "_n",
                F.explode(F.sequence(F.lit(0), F.col("_n"))).alias("_t"))
        .select(
            id_col,
            _step("_x0", "_dx").alias("tile_x"),
            _step("_y0", "_dy").alias("tile_y"),
        )
    )
    degenerate = base.where(F.col("_n") == 0).select(
        id_col, F.col("_x0").alias("tile_x"), F.col("_y0").alias("tile_y")
    )
    return walked.unionByName(degenerate).dropDuplicates(
        [id_col, "tile_x", "tile_y"]
    )


def vector_tile_coords(
    df: DataFrame,
    zoom: int,
    extent: int = 4096,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Vector-tile-local pixel coordinates — the export step for map
    rendering (Mapbox-Vector-Tile-style): each point gets its tile at
    ``zoom`` plus integer pixel offsets in the tile's local
    ``extent x extent`` grid (MVT default 4096).

    The tile columns are the IDENTICAL expressions as
    :func:`tile_x_col`/:func:`tile_y_col` (same clamping), and the
    pixel offset is ``floor((frac - tile) * extent)`` clamped to
    ``[0, extent-1]`` — one deterministic double expression per axis,
    shared shape with the SQL oracle twin, so coordinates never smear
    across engines. Edges behave: lon=180 / clamped latitudes land on
    the last pixel of the last tile, never out of range.

    Output: input columns plus ``tile_x, tile_y, px, py`` (all long).
    Pure whole-stage-codegen Column math — zero Python, zero shuffle; a
    downstream writer typically repartitions by (tile_x, tile_y), which
    is the pipeline's one shuffle, not this operator's.
    """
    if extent <= 0:
        raise ValueError("extent must be positive")
    n = 1 << _check_zoom(zoom)
    xf = (F.col(lon_col) + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n))
    phi = (
        F.least(F.greatest(F.col(lat_col), F.lit(-MAX_LAT)), F.lit(MAX_LAT))
        * F.lit(_DEG2RAD)
    )
    yf = (
        (F.lit(1.0) - F.log(F.tan(phi) + F.lit(1.0) / F.cos(phi)) / F.lit(math.pi))
        / F.lit(2.0)
        * F.lit(float(n))
    )

    def _tile(frac: Column) -> Column:
        raw = F.floor(frac)
        return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1)).cast("long")

    def _pixel(frac: Column, tile: Column) -> Column:
        raw = F.floor((frac - tile) * F.lit(float(extent)))
        return F.least(F.greatest(raw, F.lit(0)), F.lit(extent - 1)).cast("long")

    tx, ty = _tile(xf), _tile(yf)
    return (
        df.withColumn("tile_x", tx)
        .withColumn("tile_y", ty)
        .withColumn("px", _pixel(xf, F.col("tile_x")))
        .withColumn("py", _pixel(yf, F.col("tile_y")))
    )
