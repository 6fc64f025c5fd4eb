"""Watermarked stream-stream joins — the production form of the north
pipeline's input assembly.

The batch pipeline assumes one table already holding (image, caption, geo)
per row; in a live ingest, image blobs and geo metadata land as SEPARATE
streams (different producers, different latencies). Assembling them is a
Structured Streaming stream-stream equi-join: both sides carry event-time
watermarks and the join predicate bounds how far the two arrival times may
diverge, so the state store provably evicts — state is O(rows inside the
lateness horizon), independent of stream length.

This is the one join shape Structured Streaming supports for two unbounded
inputs (inner/left with watermark + time-range condition); everything
downstream (validate, encode, tile — stateless projections) composes on
the joined stream unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_keyed_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "20 minutes",
    max_delay: str = "15 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on ``key_col`` where the right-side event
    arrives within ``[left_ts - max_delay, left_ts + max_delay]``.

    Both inputs get ``watermark`` on their event-time column; the
    symmetric time-range bound is what lets Spark drop join state once
    the watermark passes a row's match horizon (without it, stream-stream
    join state grows forever). ``how``: 'inner' or 'leftOuter' (outer
    emits the unmatched left row with nulls only after its horizon
    closes). Right-side columns are suffixed ``_r`` where they collide.
    """
    lt, rt = "__lts", "__rts"
    lw = left.withColumn(lt, F.col(left_ts).cast("timestamp")).withWatermark(
        lt, watermark
    )
    collide = (set(left.columns) & set(right.columns)) - {key_col}
    taken = {f"{c}_r" for c in collide} & set(right.columns)
    if taken:
        raise ValueError(
            f"collision-suffix columns already exist on the right stream: "
            f"{sorted(taken)} — rename them before joining"
        )
    r = right
    for c in collide:
        r = r.withColumnRenamed(c, f"{c}_r")
    rw = r.withColumn(rt, F.col(f"{right_ts}_r" if right_ts in collide else right_ts).cast("timestamp")).withWatermark(
        rt, watermark
    )
    cond = (
        (lw[key_col] == rw[key_col])
        & (rw[rt] >= lw[lt] - F.expr(f"INTERVAL {max_delay}"))
        & (rw[rt] <= lw[lt] + F.expr(f"INTERVAL {max_delay}"))
    )
    joined = lw.join(rw, cond, how).drop(rw[key_col])
    return joined.drop(lt, rt)


def streaming_image_geo_join(
    images: DataFrame,
    geo: DataFrame,
    watermark: str = "20 minutes",
    max_delay: str = "15 minutes",
) -> DataFrame:
    """images stream (image_id, ..., ts) ⋈ geo stream (image_id, lat, lon,
    ts) — the live form of the batch pipeline's pre-joined input. Inner
    join: an image with no geo fix inside the horizon is not tileable and
    falls to the batch backfill path."""
    return streaming_keyed_join(
        images, geo, "image_id", watermark=watermark, max_delay=max_delay
    )
