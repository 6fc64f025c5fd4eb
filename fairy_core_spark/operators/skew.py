"""Explicit skew handling (north rule: "salting + AQE-driven skew handling
on hot cells"). AQE's skew-join split handles most cases at runtime; these
utilities cover the two patterns AQE cannot:

- ``skew_split_join``: a *broadcast-ineligible* dimension joined against a
  fact table whose key distribution has a few hot keys. AQE can split a
  skewed sort-merge partition, but every row of a hot key still lands on
  one join task pair. Salting shards each hot key across ``n_salts``
  tasks: hot facts get a random salt, the dim rows for hot keys are
  replicated once per salt, cold keys take the plain join. Exact — the
  union equals the unsalted join row-for-row.
- ``salted_distinct_count``: exact COUNT(DISTINCT val) per key without
  funnelling a hot key's whole value set through one reducer. Values are
  sharded by hash(val) % n_salts — shards are disjoint value sets, so
  distinct counts add exactly.

Hot keys are either caller-supplied (a pipeline usually knows its
hotspots — e.g. the fixture's geo hotspot cells) or detected with one
count pass over the key column (cheap map-side-combined aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_hot_keys(
    df: DataFrame, key: str, min_count: int | None = None, top_k: int = 16
) -> list:
    """Keys whose frequency qualifies them for salting. One
    map-side-combined count pass; with ``min_count`` None the threshold is
    10x the MEDIAN key frequency — the mean is itself inflated by the hot
    keys being hunted, so a 50%-of-rows key can hide under a mean-based
    threshold."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("__n"))
    if min_count is None:
        # the median job and the top-k job must share ONE scan of df —
        # without the persist the second job recomputes the full groupBy
        counts = counts.persist()
        stats = counts.agg(F.percentile_approx("__n", 0.5).alias("m")).collect()[0]
        min_count = max(int((stats["m"] or 0) * 10), 2)
    rows = counts.where(F.col("__n") >= min_count).orderBy(F.desc("__n")).limit(top_k).collect()
    counts.unpersist()
    # a null key never matches in an equi-join, so it cannot be "hot" — and a
    # None inside the array_contains literal would null-poison the cold-side
    # filter and silently drop every cold row
    return [r[key] for r in rows if r[key] is not None]


def skew_split_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    hot_keys: list | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join facts⋈dim on ``key`` with hot keys salted across
    ``n_salts`` shards. Supports inner and left joins (the dim side is the
    replicated one, so right/full would duplicate unmatched dim rows)."""
    if how not in ("inner", "left"):
        raise ValueError("skew_split_join supports how='inner' | 'left'")
    if hot_keys is None:
        hot_keys = detect_hot_keys(facts, key)
    hot_keys = [k for k in hot_keys if k is not None]  # see detect_hot_keys
    if not hot_keys:
        return facts.join(dim, key, how)

    hot_lit = F.array(*[F.lit(k) for k in hot_keys])
    is_hot = F.array_contains(hot_lit, F.col(key))

    cold = facts.where(~is_hot | F.col(key).isNull()).join(
        dim.where(~F.array_contains(hot_lit, F.col(key)) | F.col(key).isNull()),
        key,
        how,
    )
    # hot facts: random salt in [0, n_salts); hot dim rows: one replica per
    # salt (explode a literal range — dim's hot subset is small by
    # definition: it is the non-broadcastable table's few hot keys)
    hot_f = facts.where(is_hot).withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    hot_d = (
        dim.where(F.array_contains(hot_lit, F.col(key)))
        .withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    )
    hot = hot_f.join(hot_d, [key, "__salt"], how).drop("__salt")
    return cold.unionByName(hot)


def salted_distinct_count(
    df: DataFrame, key: str, val: str, n_salts: int = 16
) -> DataFrame:
    """Exact (key, n_distinct) with hot keys sharded: stage 1 counts
    distinct values within (key, hash(val) % n_salts) — disjoint value
    shards — stage 2 sums the shard counts. Both stages are
    map-side-combinable; no single reducer ever sees a hot key's full
    value set."""
    salt = F.pmod(F.xxhash64(F.col(val)), F.lit(n_salts))
    stage1 = (
        df.select(F.col(key), F.col(val), salt.alias("__salt"))
        .groupBy(key, "__salt")
        .agg(F.count_distinct(F.col(val)).alias("__d"))
    )
    return stage1.groupBy(key).agg(F.sum("__d").cast("long").alias("n_distinct"))
