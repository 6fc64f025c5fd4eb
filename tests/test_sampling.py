"""Deterministic hash sampling: stability across runs/partitionings,
stratified proportions, and weight validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fairy_core_spark.operators.sampling import hash_split, stratified_hash_sample


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(2000).select(
        F.concat(F.lit("doc"), F.col("id")).alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "web").otherwise("curated").alias("source"),
    )


def test_hash_split_deterministic_and_partition_invariant(spark, docs):
    a = {(r["doc_id"], r["split"]) for r in hash_split(docs, "doc_id").collect()}
    b = {
        (r["doc_id"], r["split"])
        for r in hash_split(docs.repartition(17), "doc_id").collect()
    }
    assert a == b  # rand()-based splits fail this; hash splits must not
    frac = sum(1 for _, s in a if s == "test") / len(a)
    assert 0.06 < frac < 0.14  # 10% target, binomial tolerance


def test_hash_split_weights_must_sum(spark, docs):
    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", {"train": 100, "test": 100})


def test_hash_split_salt_changes_assignment(spark, docs):
    a = {(r["doc_id"], r["split"]) for r in hash_split(docs, "doc_id").collect()}
    b = {
        (r["doc_id"], r["split"])
        for r in hash_split(docs, "doc_id", salt="v2").collect()
    }
    assert a != b and {x for x, _ in a} == {x for x, _ in b}


def test_stratified_proportions(spark, docs):
    got = stratified_hash_sample(
        docs, "doc_id", "source", {"web": 1.0, "curated": 0.2}
    )
    by = {r["source"]: r["n"] for r in got.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by["web"] == 1000  # fraction 1.0 keeps every row
    assert 120 < by.get("curated", 0) < 280  # 20% of 1000

    # stratum not in the map and default=0 -> dropped entirely
    none_kept = stratified_hash_sample(docs, "doc_id", "source", {"web": 0.5})
    assert none_kept.where(F.col("source") == "curated").count() == 0


def test_quota_sample_caps_and_is_partition_invariant(spark, docs):
    from fairy_core_spark.operators.sampling import quota_sample

    kept = quota_sample(docs, "source", "doc_id", 5)
    per = kept.groupBy("source").count().collect()
    assert all(r["count"] <= 5 for r in per)
    # deterministic and partition-invariant: same kept set at any layout
    a = {r["doc_id"] for r in kept.collect()}
    b = {
        r["doc_id"]
        for r in quota_sample(docs.repartition(17), "source", "doc_id", 5).collect()
    }
    assert a == b and len(a) > 0
    # salt rotates the kept set; quota=huge keeps everything; rank exposed
    c = {r["doc_id"] for r in quota_sample(docs, "source", "doc_id", 5, salt="v2").collect()}
    assert c != a
    assert quota_sample(docs, "source", "doc_id", 10**6).count() == docs.count()
    ranked = quota_sample(docs, "source", "doc_id", 5, keep_rank=True)
    assert ranked.where(F.col("sample_rank") > 5).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        quota_sample(docs, "source", "doc_id", 0)


def test_leakage_safe_split_group_integrity(spark):
    from fairy_core_spark.operators.sampling import leakage_safe_split

    docs = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    # 200 groups of width 5: members 5k..5k+4 -> group min 5k
    groups = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") - F.col("id") % 5).alias("group_id")
    )
    out = leakage_safe_split(docs, groups)
    assert out.count() == 2000 and set(out.columns) == {"doc_id", "split"}

    # no group straddles the split boundary
    joined = out.join(groups, "doc_id")
    spans = (
        joined.groupBy("group_id")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert spans == 0

    # ungrouped docs get exactly their plain hash_split assignment
    from fairy_core_spark.operators.sampling import hash_split

    plain = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, "doc_id").select("doc_id", "split").collect()
    }
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    for d in range(1000, 2000):
        assert got[d] == plain[d]
    # and a whole group carries its min-member's assignment
    for d in range(0, 1000):
        assert got[d] == plain[d - d % 5]


def test_quota_sample_scaled_sqrt_caps(spark):
    from fairy_core_spark.operators.sampling import _isqrt_col, quota_sample_scaled

    # isqrt exactness around perfect squares (the double-rounding hazard)
    vals = []
    for r in (0, 1, 2, 3, 10, 99, 100, 2**20, 2**26 - 1):
        for n in (r * r - 1, r * r, r * r + 1):
            if n >= 0:
                vals.append(n)
    df = spark.createDataFrame([(v,) for v in vals], "n long")
    got = df.select("n", _isqrt_col(F.col("n")).alias("s")).collect()
    import math

    for row in got:
        assert row["s"] == math.isqrt(row["n"]), (row["n"], row["s"])

    # caps: group sizes 100 / 25 / 4 -> keep 10m / 5m / 2m
    rows = [(i, "big") for i in range(100)]
    rows += [(1000 + i, "mid") for i in range(25)]
    rows += [(2000 + i, "tiny") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    kept = quota_sample_scaled(docs, "source", "doc_id", m=2)
    sizes = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {"big": 20, "mid": 10, "tiny": 4}
    # partition invariance (content-stable ranking)
    a = {r["doc_id"] for r in kept.collect()}
    b = {
        r["doc_id"]
        for r in quota_sample_scaled(docs.repartition(11), "source", "doc_id", m=2).collect()
    }
    assert a == b


def test_hash_bucket_random_battery_vs_duckdb(spark):
    """the md5 bucket primitive under every split/quota op: Spark
    conv(substring(md5(k),1,15),16,10) % B == DuckDB
    ('0x'||substring(md5(k),1,15))::BIGINT % B over 200 seeded random keys
    incl. unicode, empties, and salt."""
    import random

    import duckdb

    from fairy_core_spark.operators.sampling import _BUCKETS, _hash_bucket, hash_bucket_sql

    rng = random.Random(20260819)
    alpha = "abcXYZ0123 ._-/😀é中"
    keys = {"".join(rng.choice(alpha) for _ in range(rng.randint(0, 12))) for _ in range(200)}
    keys = sorted(k for k in keys)

    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r["k"]: r["b"] for r in df.select("k", _hash_bucket(F.col("k"), "s1").alias("b")).collect()
    }
    vals = ", ".join("(" + "'" + k.replace("'", "''") + "'" + ")" for k in keys)
    exp = dict(
        duckdb.sql(
            f"SELECT k, {hash_bucket_sql('k', 's1')} AS b FROM (VALUES {vals}) t(k)"
        ).fetchall()
    )
    assert got == exp and len(got) == len(keys)
    assert all(0 <= b < _BUCKETS for b in got.values())


def test_proportional_allocation_hamilton_invariants(spark):
    """Hand-derived Hamilton quotas (50/30/15/5 at budget 10 -> 5/3/2/0:
    the leftover seat goes to 'c' on the rem tie-break), sum(kept) ==
    budget, budget >= total keeps all, and the kept set is
    partition-invariant."""
    from fairy_core_spark.operators.sampling import proportional_allocation_sample

    rows = (
        [("a", i) for i in range(50)]
        + [("b", i + 100) for i in range(30)]
        + [("c", i + 200) for i in range(15)]
        + [("d", i + 300) for i in range(5)]
    )
    df = spark.createDataFrame(rows, "grp string, k long")
    out = proportional_allocation_sample(df, "grp", "k", 10)
    per = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert per == {"a": 5, "b": 3, "c": 2}
    assert sum(per.values()) == 10
    assert proportional_allocation_sample(df, "grp", "k", 1000).count() == 100
    out2 = proportional_allocation_sample(df.repartition(13), "grp", "k", 10)
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in out2.collect()}
    with pytest.raises(ValueError, match="budget"):
        proportional_allocation_sample(df, "grp", "k", 0)


def test_proportional_allocation_matches_duckdb_twin(spark):
    """Three-way parity on a skewed random frame: engine == the
    proportional_allocation_sql replay (incl. the HUGEINT div/mod and
    leftover ranking)."""
    import duckdb

    from fairy_core_spark.operators.sampling import (
        proportional_allocation_sample,
        proportional_allocation_sql,
    )

    rows = [(f"g{(i * i) % 7}", f"k{i:04d}") for i in range(400)]
    df = spark.createDataFrame(rows, "grp string, k string")
    got = {
        (r["grp"], r["k"])
        for r in proportional_allocation_sample(df, "grp", "k", 37).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (grp VARCHAR, k VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    exp = {
        tuple(r)
        for r in con.execute(
            proportional_allocation_sql("t", "grp", "k", 37)
        ).fetchall()
    }
    assert got == exp and len(got) == 37
