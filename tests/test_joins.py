"""as-of join + binned range join vs brute-force oracles on adversarial
small data (equal timestamps, no-match keys, boundary values)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fairy_core_spark.operators.joins import asof_join, interval_join_binned

T0 = dt.datetime(2025, 1, 1)


def _t(s):
    return T0 + dt.timedelta(seconds=s)


def test_asof_backward(spark):
    left = spark.createDataFrame(
        [(1, _t(10), "a"), (1, _t(20), "b"), (2, _t(5), "c"), (3, _t(9), "d")],
        "k long, ts timestamp, lbl string",
    )
    right = spark.createDataFrame(
        # k=1: two quotes, one exactly AT a left ts (inclusive); k=2 only
        # later quotes (no backward match); k=3 absent
        [(1, _t(10), 100), (1, _t(15), 101), (1, _t(15), 102), (2, _t(7), 103)],
        "k long, ts timestamp, qid long",
    )
    got = {
        (r["lbl"], r["r_qid"])
        for r in asof_join(left, right, "k", "ts", "ts", tie_col="qid").collect()
    }
    # 'a': quote at the same instant matches (inclusive); 'b': tie at t=15
    # resolves to max qid; 'c','d': no match -> dropped (inner)
    assert got == {("a", 100), ("b", 102)}
    left_rows = {
        (r["lbl"], r["r_qid"])
        for r in asof_join(left, right, "k", "ts", "ts", tie_col="qid", how="left").collect()
    }
    assert left_rows == {("a", 100), ("b", 102), ("c", None), ("d", None)}


def test_asof_forward(spark):
    left = spark.createDataFrame(
        [(1, _t(10), "a"), (2, _t(50), "z")], "k long, ts timestamp, lbl string"
    )
    right = spark.createDataFrame(
        [(1, _t(10), 7), (1, _t(8), 6), (1, _t(12), 8), (1, _t(12), 9), (2, _t(40), 1)],
        "k long, ts timestamp, qid long",
    )
    got = {
        (r["lbl"], r["r_qid"])
        for r in asof_join(
            left, right, "k", "ts", "ts", direction="forward", tie_col="qid"
        ).collect()
    }
    # 'a': earliest at-or-after is the equal-time quote (qid 7);
    # 'z': only earlier quotes -> no forward match
    assert got == {("a", 7)}


def test_asof_matches_bruteforce(spark):
    # randomized-ish volume: 40 keys, interleaved events/quotes
    left = spark.range(400).select(
        (F.col("id") % 40).alias("k"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 7 % 1000).alias("ts"),
        F.col("id").alias("lid"),
    )
    right = spark.range(300).select(
        (F.col("id") % 40).alias("k"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 13 % 1000).alias("ts"),
        F.col("id").alias("qid"),
    )
    got = {
        (r["lid"], r["r_qid"])
        for r in asof_join(left, right, "k", "ts", "ts", tie_col="qid").collect()
    }
    l, r = left.alias("l"), right.alias("r")
    from pyspark.sql import Window

    w = Window.partitionBy("l.lid").orderBy(F.desc("r.ts"), F.desc("r.qid"))
    brute = (
        l.join(r, (F.col("l.k") == F.col("r.k")) & (F.col("r.ts") <= F.col("l.ts")))
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
    )
    want = {(x["lid"], x["qid"]) for x in brute.collect()}
    assert got == want and len(got) > 100


def test_interval_join_binned_matches_theta(spark):
    pts = spark.range(2000).select(
        F.col("id").alias("pid"), ((F.col("id") * 17) % 1000 / 3.0).alias("v")
    )
    iv = spark.range(60).select(
        F.col("id").alias("band"),
        ((F.col("id") * 41) % 300 / 1.0).alias("lo"),
        (((F.col("id") * 41) % 300) / 1.0 + 11.25).alias("hi"),
    )
    got = {
        (r["pid"], r["band"])
        for r in interval_join_binned(pts, iv, "v", "lo", "hi", bin_width=7.0).collect()
    }
    want = {
        (r["pid"], r["band"])
        for r in pts.join(iv, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))).collect()
    }
    assert got == want and len(want) > 100


def test_asof_null_ts_and_null_key_never_match(spark):
    """SQL asof semantics: a NULL right timestamp or key matches nothing
    (asc-nulls-first ordering must not pin a null-ts row to early lefts)."""
    left = spark.createDataFrame(
        [(1, _t(5), "early"), (1, _t(50), "late"), (None, _t(5), "nullkey")],
        "k long, ts timestamp, lbl string",
    )
    right = spark.createDataFrame(
        [(1, None, 666), (1, _t(30), 1), (None, _t(1), 667)],
        "k long, ts timestamp, qid long",
    )
    got = {
        (r["lbl"], r["r_qid"])
        for r in asof_join(left, right, "k", "ts", "ts", tie_col="qid", how="left").collect()
    }
    assert got == {("early", None), ("late", 1), ("nullkey", None)}


def test_asof_null_tie_loses_to_nonnull(spark):
    """SQL max()/min() ignore NULLs: a right row with a NULL tie_col must
    lose the tie to any non-null row (nulls_last ordering handed F.last
    the NULL-tie row — inverted winner in both directions)."""
    left = spark.createDataFrame([(1, 10)], "k int, ts int")
    right = spark.createDataFrame(
        [(1, 5, None, "null-tie"), (1, 5, 2, "real-tie")],
        "k int, ts int, tie int, tag string",
    )
    out = asof_join(left, right, "k", "ts", "ts", "backward", tie_col="tie")
    assert out.collect()[0]["r_tag"] == "real-tie"
    fwd = asof_join(left.selectExpr("k", "ts - 9 as ts"), right, "k", "ts", "ts",
                    "forward", tie_col="tie")
    assert fwd.collect()[0]["r_tag"] == "real-tie"


def test_asof_dotted_column_names(spark):
    """Legal dotted column names must survive the struct round-trip
    (F.col('__l.geo.lat') would parse as a nested path)."""
    left = spark.createDataFrame([(1, 10, 1.5)], ["k", "ts", "geo.lat"])
    right = spark.createDataFrame([(1, 5, 9.9)], ["k", "ts", "geo.lon"])
    out = asof_join(left, right, "k", "ts", "ts", "backward")
    row = out.collect()[0]
    assert row["geo.lat"] == 1.5 and row["r_geo.lon"] == 9.9


def test_interval_join_rejects_nonpositive_bin_width(spark):
    pts = spark.createDataFrame([(1.0,)], "v double")
    iv = spark.createDataFrame([(-1.0, 2.0)], "lo double, hi double")
    for bad in (0.0, -1.0, float("nan")):
        with pytest.raises(ValueError, match="bin_width"):
            interval_join_binned(pts, iv, "v", "lo", "hi", bad)
