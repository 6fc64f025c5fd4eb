"""Streaming geofence dwell episodes: the live twin of
``spatial/trajectory.dwell_episodes`` via ``applyInPandasWithState``
(the escape hatch reserved for semantics windowed aggregation cannot
express — an episode's extent is only final once the WATERMARK has
frozen the timeline past its closing boundary, whether or not more
events arrive).

Correctness model (append mode, event-time watermark): events with
ts <= watermark are FINAL — an admissible late event always has
ts >= watermark, and a new tie at ts == watermark stably sorts after
the event already held, so nothing can be inserted into the frozen
prefix.
The per-entity timeline therefore splits into a frozen prefix
(processed exactly like the batch gaps-and-islands fold) and a raw
mutable suffix held verbatim in state. An episode is emitted exactly
when its closing boundary — the first FROZEN event of a different
region (or a NULL-region breaker) — exists; the entity's current open
run stays pending, byte-for-byte extendable, until a frozen successor
closes it. Output rows carry the same fields as the batch operator
(episode_seq is a per-entity counter carried in state; episodes close
in enter order, so it matches the batch row_number).

Scale: state per entity = ONE open-run summary + the raw events still
inside the lateness horizon + a seq counter — O(active entities x
horizon event rate), never the history. The final open episode of an
entity that goes silent stays pending by design (batch parity requires
it; it can still be extended), so state is bounded by the number of
live entities, not by time.

Tie-breaking: the frozen fold orders by ts only (a stable mergesort on
equal timestamps preserves arrival order); give events distinct
timestamps or pre-aggregate if exact tie semantics matter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "entity_id long, episode_seq long, region string, enter_ts timestamp, "
    "exit_ts timestamp, n_points long, dwell_us long"
)
STATE_SCHEMA = (
    "seq long, cur_region string, cur_enter double, cur_exit double, "
    "cur_n long, raw_ts array<double>, raw_region array<string>"
)


def streaming_dwell_episodes(
    stream: DataFrame,
    entity_col: str = "entity_id",
    ts_col: str = "ts",
    region_col: str = "region",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Closed region-visit episodes in append mode — same semantics as the
    batch ``dwell_episodes`` (NULL regions break runs without forming
    episodes; dwell_us is exact integer microseconds)."""

    def fn(key, pdfs, state: GroupState):
        eid = int(key[0])

        if state.exists:
            seq, cur_region, cur_enter, cur_exit, cur_n, raw_ts, raw_region = state.get
            raw = list(zip(list(raw_ts), list(raw_region)))
            cur = (cur_region, cur_enter, cur_exit, cur_n) if cur_n else None
        else:
            seq, raw, cur = 0, [], None

        if not state.hasTimedOut:
            for pdf in pdfs:
                # exact integer MICROS carried as doubles (exact in a
                # double up to 2^53 us ~ year 2128) — float seconds would
                # drift dwell_us on us-precision timestamps
                us = pdf["__ts"].astype("int64").to_numpy() // 1000
                regs = pdf["__region"].tolist()
                raw.extend(zip((float(t) for t in us), regs))

        wm_us = state.getCurrentWatermarkMs() * 1000.0
        raw.sort(key=lambda tr: tr[0])  # stable: equal ts keep arrival order
        # ts <= wm is final: a late event needs ts >= wm, and a new tie at
        # ts == wm stably sorts AFTER the already-held event — nothing can
        # ever be inserted before an event at-or-below the watermark.
        # wm == 0 means "no watermark yet": hold everything.
        frozen = [tr for tr in raw if wm_us > 0 and tr[0] <= wm_us]
        kept = [tr for tr in raw if not (wm_us > 0 and tr[0] <= wm_us)]

        # batch gaps-and-islands fold over the frozen prefix: a region
        # change (or NULL breaker) closes the current run — and a closed
        # run is ALWAYS emit-safe here, because its closer is itself frozen
        closed: list[tuple[str, float, float, int]] = []
        for t, r in frozen:
            r = None if r is None or (isinstance(r, float) and pd.isna(r)) else r
            if cur is not None and r == cur[0]:
                cur = (cur[0], cur[1], t, cur[3] + 1)
                continue
            if cur is not None:
                closed.append(cur)
                cur = None
            if r is not None:
                cur = (r, t, t, 1)

        if cur is not None or kept:
            state.update(
                (
                    int(seq + len(closed)),
                    cur[0] if cur is not None else None,
                    cur[1] if cur is not None else 0.0,
                    cur[2] if cur is not None else 0.0,
                    int(cur[3]) if cur is not None else 0,
                    [t for t, _ in kept],
                    [r for _, r in kept],
                )
            )
            if kept:
                # re-arm: when the watermark passes the oldest raw event it
                # becomes frozen and must be folded even with no new input
                state.setTimeoutTimestamp(int(min(t for t, _ in kept) // 1000) + 1)
        else:
            state.remove()

        if closed:
            enter = [pd.to_datetime(int(c[1]), unit="us") for c in closed]
            exit_ = [pd.to_datetime(int(c[2]), unit="us") for c in closed]
            yield pd.DataFrame(
                {
                    "entity_id": np.full(len(closed), eid, dtype=np.int64),
                    "episode_seq": np.arange(seq + 1, seq + len(closed) + 1, dtype=np.int64),
                    "region": [c[0] for c in closed],
                    "enter_ts": enter,
                    "exit_ts": exit_,
                    "n_points": np.array([c[3] for c in closed], dtype=np.int64),
                    "dwell_us": np.array(
                        [int(c[2] - c[1]) for c in closed], dtype=np.int64
                    ),
                }
            )

    events = stream.select(
        F.col(entity_col).alias("entity_id"),
        F.col(ts_col).cast("timestamp").alias("__ts"),
        F.col(region_col).alias("__region"),
    ).withWatermark("__ts", watermark)
    # NULL entity can't be keyed; NULL ts can't be ordered. NULL region
    # stays — it is the batch operator's episode BREAKER.
    events = events.where(F.col("entity_id").isNotNull() & F.col("__ts").isNotNull())
    return events.groupBy("entity_id").applyInPandasWithState(
        fn,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
