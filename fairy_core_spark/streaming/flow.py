"""Streaming movement hops: the live twin of
``spatial/trajectory.flow_sector_rollup``'s pairing stage via
``applyInPandasWithState`` (stateful because a hop needs the PREVIOUS
event per entity — windowed aggregation cannot express consecutive-pair
semantics).

Correctness model (append mode, event-time watermark — the same frozen-
prefix argument as ``streaming/geofence.py``): events with ts <=
watermark are FINAL, and a new tie at ts == watermark stably sorts after
the event already held, so the sorted frozen prefix never changes. Every
consecutive pair WITHIN the frozen prefix (including the pair formed
with the anchor — the last frozen event carried in state from earlier
batches) is therefore final and emits exactly once. The newest frozen
event becomes the next anchor: it still pairs with a future event, and
that hop emits when its successor freezes.

Lateness contract (standard Structured Streaming semantics): rows with
event time below the current watermark are dropped by Spark's late-row
filter BEFORE this operator — size ``watermark`` to the real arrival
skew; batch parity holds over the admissible (non-dropped) event set.

Quantization contract (identical to the batch operator): positions are
near-integer millidegrees; both engines round to the nearest integer, so
deltas and the zero-hop drop are exact integer decisions. Exact .5
millidegree inputs are out of contract (the batch op documents the same).

Scale: state per entity = ONE anchor event + the raw events still above
the lateness horizon — O(active entities x horizon event rate), never
history. Tile/sector assignment deliberately does NOT happen here:
compose downstream with the certified Column math
(``spatial/webmercator.tile_x_col``/``tile_y_col`` and
``spatial/trajectory.compass_sector``) so the stateful operator stays a
pure pairing kernel — see :func:`streaming_flow_sectors`.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, ts timestamp, lat double, lon double, dx long, dy long"
)
STATE_SCHEMA = (
    "anchor_us double, anchor_lat double, anchor_lon double, "
    "raw_ts array<double>, raw_lat array<double>, raw_lon array<double>"
)


def _mdeg(v: float) -> int:
    # nearest integer millidegree; inputs are near-integer by contract so
    # the .5 tie direction never decides a result
    return int(math.floor(v * 1000.0 + 0.5))


def streaming_hops(
    stream: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    lat_col: str = "lat",
    lon_col: str = "lon",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Finalized consecutive-pair hops per entity in append mode: one row
    per frozen pair with a nonzero millidegree displacement, carrying the
    START event's (ts, lat, lon) and the exact integer (dx, dy) — the
    same rows the batch operator pairs, emitted exactly once each."""

    def fn(key, pdfs, state: GroupState):
        uid = int(key[0])
        if state.exists:
            a_us, a_lat, a_lon, r_ts, r_lat, r_lon = state.get
            anchor = (a_us, a_lat, a_lon) if a_us >= 0 else None
            raw = list(zip(list(r_ts), list(r_lat), list(r_lon)))
        else:
            anchor, raw = None, []

        if not state.hasTimedOut:
            for pdf in pdfs:
                us = pdf["__ts"].astype("int64").to_numpy() // 1000
                la = pdf["__lat"].to_numpy(dtype="float64")
                lo = pdf["__lon"].to_numpy(dtype="float64")
                raw.extend(
                    (float(u), float(a), float(o)) for u, a, o in zip(us, la, lo)
                )

        wm_us = state.getCurrentWatermarkMs() * 1000.0
        raw.sort(key=lambda t: t[0])  # stable: equal ts keep arrival order
        frozen = [t for t in raw if wm_us > 0 and t[0] <= wm_us]
        kept = [t for t in raw if not (wm_us > 0 and t[0] <= wm_us)]

        seq = ([anchor] if anchor is not None else []) + frozen
        moves = []
        for p, q in zip(seq, seq[1:]):
            m1 = (_mdeg(p[1]), _mdeg(p[2]))
            m2 = (_mdeg(q[1]), _mdeg(q[2]))
            if m1 != m2:
                moves.append((p[0], p[1], p[2], m2[1] - m1[1], m2[0] - m1[0]))
        if frozen:
            anchor = frozen[-1]

        if anchor is not None or kept:
            state.update(
                (
                    float(anchor[0]) if anchor is not None else -1.0,
                    float(anchor[1]) if anchor is not None else 0.0,
                    float(anchor[2]) if anchor is not None else 0.0,
                    [t for t, _, _ in kept],
                    [a for _, a, _ in kept],
                    [o for _, _, o in kept],
                )
            )
            if kept:
                # re-arm: when the watermark passes the oldest raw event it
                # freezes and must pair even if no new input arrives
                state.setTimeoutTimestamp(int(min(t for t, _, _ in kept) // 1000) + 1)
        else:
            state.remove()

        if moves:
            yield pd.DataFrame(
                {
                    "user_id": np.full(len(moves), uid, dtype=np.int64),
                    "ts": [pd.to_datetime(int(m[0]), unit="us") for m in moves],
                    "lat": np.array([m[1] for m in moves], dtype=np.float64),
                    "lon": np.array([m[2] for m in moves], dtype=np.float64),
                    "dx": np.array([m[3] for m in moves], dtype=np.int64),
                    "dy": np.array([m[4] for m in moves], dtype=np.int64),
                }
            )

    events = stream.select(
        F.col(entity_col).alias("user_id"),
        F.col(ts_col).cast("timestamp").alias("__ts"),
        F.col(lat_col).alias("__lat"),
        F.col(lon_col).alias("__lon"),
    ).withWatermark("__ts", watermark)
    events = events.where(
        F.col("user_id").isNotNull()
        & F.col("__ts").isNotNull()
        & F.col("__lat").isNotNull()
        & F.col("__lon").isNotNull()
    )
    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def streaming_flow_sectors(
    stream: DataFrame,
    zoom: int,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    lat_col: str = "lat",
    lon_col: str = "lon",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Live flow-map feed: :func:`streaming_hops` composed with the SAME
    certified Column math the batch rollup uses — zoom tiles from the
    hop's start point plus the exact-integer compass sector. A stateless
    projection over the append stream; aggregate downstream (windowed
    agg or ``foreachBatch``) into per-tile direction histograms.
    Aggregated over any complete window, counts and net displacement
    sums match ``flow_sector_rollup`` on the same events (batch-parity
    tested)."""
    from fairy_core_spark.spatial.trajectory import compass_sector
    from fairy_core_spark.spatial.webmercator import tile_x_col, tile_y_col

    hops = streaming_hops(
        stream,
        entity_col=entity_col,
        ts_col=ts_col,
        lat_col=lat_col,
        lon_col=lon_col,
        watermark=watermark,
    )
    return hops.select(
        "user_id",
        "ts",
        tile_x_col(F.col("lon"), zoom).alias("x"),
        tile_y_col(F.col("lat"), zoom).alias("y"),
        compass_sector(F.col("dx"), F.col("dy")).alias("sector"),
        "dx",
        "dy",
    )
