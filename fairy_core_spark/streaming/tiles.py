"""Structured Streaming tile rollup — the streaming analogue of the north
pipeline's raster→vector tiling stage (spatial/ops.py ``tile_assign`` /
``tile_aggregates``). The reference is batch-only (SURVEY.md §2.7); a
100 TB ingest pipeline wants per-tile statistics *as images land*: encode
each arriving (lat, lon) to its S2 tile — the same Arrow ``cell_udf``
projection used in batch, projections stream for free — then a
watermark-closed windowed aggregation per (window, tile).

Streaming constraints honored:

- **No exact countDistinct** in a streaming agg: the per-tile phash-dup
  statistic uses ``approx_count_distinct`` (HLL, mergeable partial state —
  exactly what an unbounded rollup should carry; the batch path keeps the
  exact two-level form). The relative error bound is a parameter.
- **Single aggregation** (append mode allows one): the two-level exact
  dedup rollup of the batch path is not expressible, so the exact variant
  is offered via ``foreach_batch_tile_writer`` (per-micro-batch batch
  plan + idempotent overwrite of the window partition).
- **Watermark closes windows**: a (window, tile) row is emitted once the
  event-time watermark passes window end — late images inside the
  watermark still count; later ones are dropped, observable in
  ``numDroppedRows``.

At 10^12 images the state is O(open windows × active tiles), independent
of stream length — tiles whose windows closed hold no state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fairy_core_spark.spatial.ops import TILE_LEVEL, with_cell


def _encode_cell(
    stream: DataFrame, lat_col: str, lon_col: str, level: int, out: str, scheme: str
) -> DataFrame:
    """Scheme dispatch for the streaming encode. s2/hex7 are one Arrow
    projection (with_cell); webmercator is pure Column math — the cell is
    the base-4 quadkey string at zoom ``level`` and the streaming plan
    contains NO Python at all."""
    if scheme == "webmercator":
        from fairy_core_spark.spatial.webmercator import (
            quadkey_col,
            tile_x_col,
            tile_y_col,
        )

        return stream.withColumn(
            out,
            quadkey_col(
                tile_x_col(F.col(lon_col), level),
                tile_y_col(F.col(lat_col), level),
                level,
            ),
        )
    return with_cell(stream, lat_col, lon_col, level, out=out, scheme=scheme)


def streaming_tile_rollup(
    stream: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    ts_col: str = "ts",
    level: int = TILE_LEVEL,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "20 minutes",
    rsd: float = 0.05,
    cell_scheme: str = "s2",
) -> DataFrame:
    """Per-(window, tile) streaming rollup: image count, mean dims, distinct
    phash estimate (HLL with relative std deviation ``rsd``), dup estimate.

    Returns a streaming DataFrame (window, tile_id, n_images, avg_w, avg_h,
    approx_distinct_phash, approx_phash_dups) for ``writeStream`` in append
    mode. Column set mirrors the batch ``tile_aggregates`` where streaming
    semantics allow (exact dup counts need the batch path or
    ``foreach_batch_tile_writer``). ``cell_scheme``: "s2" (default),
    "hex7" (hexagonal tiles — pass a hex7 res as ``level``), or
    "webmercator" (slippy-map tiles — pass a zoom; tile_id is the base-4
    quadkey string and the encode is zero-Python Column math); the
    encode is a stateless projection either way, so the scheme choice
    does not touch watermark/state semantics.
    """
    tiled = _encode_cell(stream, lat_col, lon_col, level, "tile_id", cell_scheme)
    tiled = tiled.withColumn("__event_ts", F.col(ts_col).cast("timestamp"))
    win = F.window(F.col("__event_ts"), window, slide or window)
    n = F.count(F.lit(1))
    distinct_ph = F.approx_count_distinct("phash", rsd)
    return (
        tiled.withWatermark("__event_ts", watermark)
        .groupBy(win.alias("window"), F.col("tile_id"))
        .agg(
            n.alias("n_images"),
            F.round(F.avg("w"), 4).alias("avg_w"),
            F.round(F.avg("h"), 4).alias("avg_h"),
            distinct_ph.alias("approx_distinct_phash"),
            F.greatest(F.lit(0), n - distinct_ph).alias("approx_phash_dups"),
        )
    )


def foreach_batch_tile_writer(
    catalog_root: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    ts_col: str = "ts",
    level: int = TILE_LEVEL,
    window: str = "10 minutes",
    cell_scheme: str = "s2",
):
    """Exact-variant sink: a ``foreachBatch`` function that runs the BATCH
    two-level exact dup rollup (spatial/ops.py ``tile_aggregates_annotated``
    shape, minus PIP) over each micro-batch and writes
    (window_start, tile_id, n_images, n_phash_dups, batch_id) rows
    partitioned by ``batch_id`` (dynamic overwrite of the batch's own
    partition — that per-batch layout is what makes replays idempotent;
    window_start is a plain column, not a partition key).

    Exactness model: per-micro-batch exact, merged by downstream readers
    summing over batch_id — the standard streaming→lakehouse pattern when
    an aggregate (exact distinct) cannot live in stream state. Replayed
    micro-batches overwrite their own (batch_id) output → idempotent.
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        tiled = with_cell(batch_df, lat_col, lon_col, level, out="tile_id", scheme=cell_scheme)
        tiled = tiled.withColumn(
            "window_start",
            F.window(F.col(ts_col).cast("timestamp"), window).getField("start"),
        )
        lvl1 = tiled.groupBy("window_start", "tile_id", "phash").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("w").alias("sw"),
            F.sum("h").alias("sh"),
        )
        out = (
            lvl1.groupBy("window_start", "tile_id")
            .agg(
                F.sum("cnt").alias("n_images"),
                F.round(F.sum("sw") / F.sum("cnt"), 4).alias("avg_w"),
                F.round(F.sum("sh") / F.sum("cnt"), 4).alias("avg_h"),
                (F.sum("cnt") - F.count(F.lit(1))).alias("n_phash_dups"),
            )
            .withColumn("batch_id", F.lit(batch_id))
        )
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(catalog_root)
        )

    return _write


def streaming_tile_pyramid(
    stream: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    ts_col: str = "ts",
    levels: tuple[int, ...] = (12, 8, 4),
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "20 minutes",
    cell_scheme: str = "s2",
) -> DataFrame:
    """Multi-resolution streaming rollup: (window, res, cell, n_images,
    avg_w, avg_h) for every pyramid level at once, for any of the three
    cell schemes ("s2", "hex7", "webmercator" — the latter fully
    Python-free: quadkey encode + substring-prefix parents). Encode ONCE
    at ``max(levels)`` (for s2/hex7, the only Python in the plan);
    coarser cells are stateless codegen parent math riding the same one-pass
    Generate(stack) as the batch pyramid (spatial/ops.s2_pyramid /
    spatial/hex7_ops.hex7_pyramid), so streaming state stays one
    watermark-closed aggregation over O(open windows x active cells
    summed over levels) — exploding levels BEFORE the agg multiplies
    rows len(levels)x map-side but never adds a second stateful stage
    (two chained streaming aggs would be illegal in append mode anyway).
    """
    base = max(int(l) for l in levels)
    tiled = _encode_cell(stream, lat_col, lon_col, base, "__cell", cell_scheme)
    if cell_scheme == "hex7":
        from fairy_core_spark.spatial.hex7_ops import hex7_pyramid

        stacked = hex7_pyramid(tiled, cell_col="__cell", levels=levels)
    elif cell_scheme == "webmercator":
        from fairy_core_spark.spatial.webmercator import pyramid

        stacked = pyramid(tiled, quadkey_col="__cell", zooms=levels)
    else:
        from fairy_core_spark.spatial.ops import s2_pyramid

        stacked = s2_pyramid(tiled, cell_col="__cell", levels=levels)
    stacked = stacked.withColumn("__event_ts", F.col(ts_col).cast("timestamp"))
    win = F.window(F.col("__event_ts"), window, slide or window)
    return (
        stacked.withWatermark("__event_ts", watermark)
        .groupBy(win.alias("window"), F.col("res"), F.col("cell"))
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.round(F.avg("w"), 4).alias("avg_w"),
            F.round(F.avg("h"), 4).alias("avg_h"),
        )
    )


def streaming_heatmap(
    stream: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    ts_col: str = "ts",
    zoom: int = 8,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "20 minutes",
) -> DataFrame:
    """Streaming twin of spatial/ops.smoothed_tile_density: per-(window,
    tile) binomial-kernel 3x3 heatmap raster — (window, tile_x, tile_y,
    n_points, density_x16), integer-exact via the x16-scaled kernel,
    zero-padding edges (scatter targets off the grid are dropped).

    Physical contrast with the batch op: batch collapses points to the
    occupied-tile frame FIRST and scatters that small frame, but a
    pre-aggregation here would be a second stateful stage (illegal
    under append mode), so the 9-offset scatter runs PER POINT as a
    stateless codegen explode before the one legal watermark-closed
    aggregation. The 9x row multiplication never reaches the wire:
    map-side partial aggregation collapses it to the occupied-dilation
    frame per partition, so the shuffle still carries (window, x, y,
    int64 partials). The whole plan is Python-free (slippy encode +
    explode + agg, all Column math)."""
    from fairy_core_spark.spatial.webmercator import _check_zoom, tile_x_col, tile_y_col

    hi = (1 << _check_zoom(zoom)) - 1
    offsets = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"),
                F.lit(dy).alias("dy"),
                F.lit((2 - abs(dx)) * (2 - abs(dy))).alias("w"),
            )
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    scattered = (
        stream.withColumn("__x", tile_x_col(F.col(lon_col), zoom))
        .withColumn("__y", tile_y_col(F.col(lat_col), zoom))
        .withColumn("__event_ts", F.col(ts_col).cast("timestamp"))
        .select("__event_ts", F.explode(offsets).alias("o"), "__x", "__y")
        .select(
            "__event_ts",
            (F.col("__x") + F.col("o.dx")).alias("tile_x"),
            (F.col("__y") + F.col("o.dy")).alias("tile_y"),
            F.col("o.w").alias("w"),
            ((F.col("o.dx") == 0) & (F.col("o.dy") == 0)).cast("long").alias("self_n"),
        )
        .where(F.col("tile_x").between(0, hi) & F.col("tile_y").between(0, hi))
    )
    win = F.window(F.col("__event_ts"), window, slide or window)
    return (
        scattered.withWatermark("__event_ts", watermark)
        .groupBy(win.alias("window"), F.col("tile_x"), F.col("tile_y"))
        .agg(
            F.sum("self_n").alias("n_points"),
            F.sum("w").alias("density_x16"),
        )
    )
