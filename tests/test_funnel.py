"""Ordered event funnel (queries.funnel_view_click_purchase): strict
event-time ordering over each stage's first occurrence."""

from __future__ import annotations

import datetime as dt


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_funnel_stages_and_edge_cases(spark, tmp_path):
    from fairy_core_spark.queries import funnel_view_click_purchase

    t = lambda m: dt.datetime(2026, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1: full funnel in order -> 3
        (1, t(1), 1, "view", 0.0, ""),
        (2, t(2), 1, "click", 0.0, ""),
        (3, t(3), 1, "purchase", 0.0, ""),
        # u2: click before view; later click advances (first click wins? no:
        # first click is BEFORE first view -> stage 1)
        (4, t(5), 2, "view", 0.0, ""),
        (5, t(4), 2, "click", 0.0, ""),
        (6, t(9), 2, "purchase", 0.0, ""),
        # u3: view then click, purchase before click -> 2
        (7, t(1), 3, "view", 0.0, ""),
        (8, t(5), 3, "click", 0.0, ""),
        (9, t(3), 3, "purchase", 0.0, ""),
        # u4: view only -> 1 (noise event types ignored)
        (10, t(1), 4, "view", 0.0, ""),
        (11, t(2), 4, "error", 0.0, ""),
        # u5: click+purchase but never viewed -> excluded
        (12, t(1), 5, "click", 0.0, ""),
        (13, t(2), 5, "purchase", 0.0, ""),
        # u6: tie timestamps (click at the same instant as view) -> 1
        (14, t(1), 6, "view", 0.0, ""),
        (15, t(1), 6, "click", 0.0, ""),
        # u7: repeat views/clicks — FIRST occurrence decides -> 3
        (16, t(1), 7, "view", 0.0, ""),
        (17, t(9), 7, "view", 0.0, ""),
        (18, t(2), 7, "click", 0.0, ""),
        (19, t(8), 7, "click", 0.0, ""),
        (20, t(4), 7, "purchase", 0.0, ""),
    ]
    _write_events(spark, tmp_path, rows)
    got = {
        r["user_id"]: r["reached_stage"]
        for r in funnel_view_click_purchase(spark, str(tmp_path)).collect()
    }
    assert got == {1: 3, 2: 1, 3: 2, 4: 1, 6: 1, 7: 3}
