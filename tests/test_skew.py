"""Skew utilities: salted join equals the plain join exactly on skewed
data; salted distinct-count equals count_distinct; hot-key detection finds
the planted hotspot."""

from __future__ import annotations

from pyspark.sql import functions as F

from fairy_core_spark.operators.skew import (
    detect_hot_keys,
    salted_distinct_count,
    skew_split_join,
)


def _skewed(spark):
    # key 7 holds ~50% of fact rows; dim has keys 0..19 (facts 15..19 miss)
    facts = spark.range(0, 10_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(F.col("id") % 15).alias("k"),
        (F.col("id") * 3).alias("payload"),
    )
    dim = spark.range(0, 20).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("attr")
    )
    return facts, dim


def test_detect_hot_keys(spark):
    facts, _ = _skewed(spark)
    hot = detect_hot_keys(facts, "k")
    assert hot == [7]


def test_skew_split_join_matches_plain(spark):
    facts, dim = _skewed(spark)
    for how in ("inner", "left"):
        plain = {
            (r["k"], r["payload"], r["attr"])
            for r in facts.join(dim, "k", how).collect()
        }
        salted = {
            (r["k"], r["payload"], r["attr"])
            for r in skew_split_join(facts, dim, "k", n_salts=4, how=how).collect()
        }
        assert salted == plain and len(plain) == 10_000
    # row multiplicity preserved too (sets could hide dup/loss of dup rows)
    assert skew_split_join(facts, dim, "k", n_salts=4).count() == facts.join(dim, "k").count()


def test_skew_split_join_explicit_hot_keys(spark):
    facts, dim = _skewed(spark)
    got = skew_split_join(facts, dim, "k", n_salts=3, hot_keys=[7, 1]).count()
    assert got == facts.join(dim, "k").count()


def test_salted_distinct_count_exact(spark):
    facts, _ = _skewed(spark)
    want = {
        r["k"]: r["n"]
        for r in facts.groupBy("k").agg(F.count_distinct("payload").alias("n")).collect()
    }
    got = {
        r["k"]: r["n_distinct"]
        for r in salted_distinct_count(facts, "k", "payload", n_salts=8).collect()
    }
    assert got == want


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed on the join key must sort-merge-join with zero
    Exchange in the physical plan — the co-location contract the north
    pipeline's broadcast_geo=False path relies on at full scale."""
    from pyspark.sql import functions as F

    from fairy_core_spark.sources.tables import write_bucketed

    a = spark.range(0, 5000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("x"))
    b = spark.range(0, 5000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("y"))
    write_bucketed(a, "bkt_a", "k", n_buckets=8)
    write_bucketed(b, "bkt_b", "k", n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # fixture tables are tiny, so the planner would broadcast and skip
        # bucketing; at the scale this path exists for (both sides huge)
        # broadcast is off the table — emulate that explicitly
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan and "Bucketed: true" in plan
        assert j.count() == 5000
        got = j.where(F.col("k") == 17).collect()[0]
        assert (got["x"], got["y"]) == (34, 51)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_skew_join_null_keys_not_poisoned(spark):
    """A NULL key must behave like the plain join (facts with null keys
    match nothing; cold rows survive) — an un-filtered None in the hot-key
    array literal used to null-poison the cold-side filter and drop every
    cold row."""
    facts = spark.createDataFrame(
        [(None, 1)] * 50 + [(7, 2)] * 100 + [(3, 3)] * 5,
        "k long, payload long",
    )
    dim = spark.createDataFrame([(7, "hot"), (3, "cold"), (None, "nullrow")], "k long, attr string")
    from collections import Counter

    for how in ("inner", "left"):
        plain = Counter(
            (r["k"], r["payload"], r["attr"]) for r in facts.join(dim, "k", how).collect()
        )
        salted = Counter(
            (r["k"], r["payload"], r["attr"])
            for r in skew_split_join(facts, dim, "k", n_salts=4, hot_keys=[7, None], how=how).collect()
        )
        assert salted == plain
