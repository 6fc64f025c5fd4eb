"""Streaming exact deduplication — the ingest-time analogue of
``operators/dedup.py:exact_dup_groups`` (SURVEY.md §2.8).

Built entirely on ``dropDuplicatesWithinWatermark``: state holds one
entry per distinct key seen within the watermark horizon and the engine
evicts entries older than the watermark, so state is bounded by
(distinct keys per horizon), not by stream length — the property that
makes exact dedup runnable on an unbounded 100 TB/day ingest. Keys are
hashed first (md5 of the content column) so the state store carries
16-byte digests instead of documents/images, mirroring the batch
operator's hash-first shuffle design.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup_keys(
    stream: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Keep the first row per key within the watermark horizon.

    A duplicate arriving later than ``watermark`` after the original is
    NOT suppressed (its state entry was evicted) — that is the documented
    trade-off that bounds state; choose the horizon from the duplicate
    inter-arrival distribution, and run the batch `exact_dup_groups`
    pass over the landed table for the long tail.
    """
    s = stream.withColumn("__event_ts", F.col(ts_col).cast("timestamp")).withWatermark(
        "__event_ts", watermark
    )
    return s.dropDuplicatesWithinWatermark(list(key_cols)).drop("__event_ts")


def streaming_dedup_content(
    stream: DataFrame,
    content_col: str,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    out: str = "content_hash",
) -> DataFrame:
    """Content-exact streaming dedup: state carries the 16-byte md5 of
    ``content_col`` (text or binary), never the content itself."""
    hashed = stream.withColumn(out, F.md5(F.col(content_col).cast("binary")))
    return streaming_dedup_keys(hashed, [out], ts_col=ts_col, watermark=watermark)
