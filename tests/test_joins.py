"""as-of join + binned range join vs brute-force oracles on adversarial
small data (equal timestamps, no-match keys, boundary values)."""

from __future__ import annotations

import datetime as dt

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
