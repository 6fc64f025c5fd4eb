"""Deterministic sampling / splitting for training-data pipelines.

Everything here is a pure projection keyed on a content-stable hash of an
id column — no RNG state, no shuffle, no driver participation:

- the same row lands in the same split on every run, every backfill, and
  every engine (md5 is bit-identical everywhere; the DuckDB correctness
  oracle replays the exact bucket arithmetic), which is the property a
  train/test split must have at 100 TB — `F.rand()` splits shift when
  partitioning changes, hash splits never do;
- sampling composes with pushdown: the bucket predicate sits right on
  the scan, so a 1% sample reads ~1% of row groups when the table is
  sorted/bucketed by the key.

The reference has no sampling surface (its pandas runner operates on
whole files); these are the scale-path operators a Spark user needs on
top of the same tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000  # 0.01% resolution


def _salted_key(col: Column, salt: str = "") -> Column:
    """The ONE string both engines hash: COALESCE(CAST(key), '') with the
    salt prepended. NULL keys hash like the empty string (defined — not a
    NULL bucket that would leave rows unlabeled/dropped); DuckDB replays
    the identical coalesce so NULL behavior matches cross-engine."""
    k = F.coalesce(col.cast("string"), F.lit(""))
    return F.concat(F.lit(salt), k) if salt else k


def _salted_key_sql(key: str, salt: str = "") -> str:
    e = f"COALESCE(CAST({key} AS VARCHAR), '')"
    return f"'{salt}' || {e}" if salt else e


def _md5_60_col(salted: Column) -> Column:
    """md5 first 15 hex chars -> 60-bit long (the engine-portable hash —
    single implementation for every sampling operator; see dedup._md5_60
    for why md5, not xxhash64)."""
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def _hash_bucket(col: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, 10000) from md5(salt || key)."""
    return (_md5_60_col(_salted_key(col, salt)) % _BUCKETS).cast("int")


def hash_bucket_sql(key: str, salt: str = "") -> str:
    """DuckDB replay of :func:`_hash_bucket` (oracle building block)."""
    expr = _salted_key_sql(key, salt)
    return f"CAST(('0x' || substring(md5({expr}), 1, 15))::BIGINT % {_BUCKETS} AS INTEGER)"


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, int] | None = None,
    salt: str = "",
    out: str = "split",
) -> DataFrame:
    """Assign every row a split label by hash bucket: ``splits`` maps
    label -> weight in parts-per-10000, consumed in insertion order
    (cumulative ranges). Default 90/10 train/test. Weights must sum to
    10000 so every row is labeled."""
    splits = splits or {"train": 9000, "test": 1000}
    if any(w <= 0 for w in splits.values()):
        raise ValueError(f"split weights must be positive, got {splits}")
    if sum(splits.values()) != _BUCKETS:
        raise ValueError(f"split weights must sum to {_BUCKETS}, got {sum(splits.values())}")
    bucket = _hash_bucket(F.col(key_col), salt)
    expr = None
    hi = 0
    for label, w in splits.items():
        hi += w
        cond = bucket < hi
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return df.withColumn(out, expr)


def hash_split_case_sql(key: str, splits: dict[str, int] | None = None, salt: str = "") -> str:
    """The CASE expression replaying :func:`hash_split` in DuckDB."""
    splits = splits or {"train": 9000, "test": 1000}
    b = hash_bucket_sql(key, salt)
    parts = []
    hi = 0
    for label, w in splits.items():
        hi += w
        parts.append(f"WHEN {b} < {hi} THEN '{label}'")
    return "CASE " + " ".join(parts) + " END"


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Keep each row with its stratum's fraction, deterministically:
    row kept iff hash_bucket(key) < fraction * 10000. Exactly the
    per-stratum downsampling a corpus-mixing recipe needs ("keep 10% of
    crawl, 100% of curated"), reproducible row-for-row across runs."""
    bucket = _hash_bucket(F.col(key_col), salt)
    thresh = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == stratum
        t = F.lit(int(round(frac * _BUCKETS)))
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = thresh.otherwise(int(round(default * _BUCKETS))) if thresh is not None \
        else F.lit(int(round(default * _BUCKETS)))
    return df.where(bucket < thresh)


def quota_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    quota: int,
    salt: str = "",
    keep_rank: bool = False,
) -> DataFrame:
    """Deterministic per-group quota sampling — the web-pipeline
    "cap documents per domain" operator: keep at most ``quota`` rows per
    ``group_col`` value, chosen by ascending md5(salt || key) with the
    key as tie-break. Hash ranking makes the kept set content-stable
    (same rows survive every run/backfill/engine — F.rand() caps shift
    with partitioning) and unbiased w.r.t. input order.

    Scale shape: ONE window shuffle on the group key; AQE's skew handling
    applies to hot domains, and because rank only needs the top
    ``quota``, Spark's WindowGroupLimit pushes the rank<=k filter into a
    partial top-k before the shuffle on recent versions. The DuckDB
    oracle replays the exact hash + ROW_NUMBER arithmetic."""
    from pyspark.sql import Window

    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")
    h = _md5_60_col(_salted_key(F.col(key_col), salt))
    # nulls-last explicitly: Spark ASC defaults NULLS FIRST, DuckDB NULLS
    # LAST — with NULL keys hashed via coalesce h is never null, but the
    # key tie-break column itself can be
    w = Window.partitionBy(group_col).orderBy(
        h.asc(), F.col(key_col).asc_nulls_last()
    )
    ranked = df.withColumn("__qs_rank", F.row_number().over(w))
    kept = ranked.where(F.col("__qs_rank") <= quota)
    if keep_rank:
        return kept.withColumnRenamed("__qs_rank", "sample_rank")
    return kept.drop("__qs_rank")


def quota_sample_sql(table: str, group: str, key: str, quota: int, salt: str = "") -> str:
    """DuckDB replay of :func:`quota_sample` (oracle building block)."""
    expr = _salted_key_sql(key, salt)
    return f"""
    SELECT * EXCLUDE (__h, __r) FROM (
      SELECT *, ('0x' || substring(md5({expr}), 1, 15))::BIGINT AS __h,
             ROW_NUMBER() OVER (PARTITION BY {group}
               ORDER BY __h ASC, {key} ASC NULLS LAST) AS __r
      FROM {table}
    ) WHERE __r <= {quota}
    """


def leakage_safe_split(
    df: DataFrame,
    groups: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "group_id",
    splits: dict[str, int] | None = None,
    salt: str = "",
    out: str = "split",
) -> DataFrame:
    """:func:`hash_split` keyed on the near-dup GROUP instead of the row id:
    every member of a dup group (a connected component of dedup pairs,
    operators/dedup.connected_components) lands in the same split, closing
    the classic eval-leakage hole where train and test each keep one copy
    of a duplicated document. Rows absent from ``groups`` key on their own
    id (a group of one), so the assignment is unchanged for unique docs.

    ``groups`` is (id, group_id) — usually a small fraction of the corpus;
    the left equi-join broadcasts under AQE when it is, and is an ordinary
    shuffle join when it is not. Determinism: group_id is the component's
    min member id, itself content-stable, so the split survives
    recomputation and repartitioning."""
    g = groups.select(F.col(id_col), F.col(group_col).alias("__gkey"))
    keyed = df.join(g, id_col, "left").withColumn(
        "__skey", F.coalesce(F.col("__gkey"), F.col(id_col))
    )
    return hash_split(keyed, "__skey", splits, salt, out).drop("__gkey", "__skey")


def _isqrt_col(n: Column) -> Column:
    """Exact integer sqrt of a non-negative long Column: floor(sqrt(double))
    plus a +-1 integer fix-up, so the result is correct even when the
    double rounds across the boundary (error beyond +-1 is impossible for
    n < 2^52). Engine-portable: the same fix-up runs in the DuckDB twin."""
    s0 = F.floor(F.sqrt(n.cast("double"))).cast("long")
    s1 = s0 + F.when((s0 + 1) * (s0 + 1) <= n, 1).otherwise(0)
    return s1 - F.when(s1 * s1 > n, 1).otherwise(0)


def quota_sample_scaled(
    df: DataFrame,
    group_col: str,
    key_col: str,
    m: int = 1,
    salt: str = "",
) -> DataFrame:
    """Sublinear per-group quota: cap_g = m * isqrt(|g|) — the
    sqrt-temperature mixture heuristic (suppress head domains, keep the
    tail): a 1M-doc domain keeps 1000*m docs, a 100-doc domain keeps
    10*m. Same content-stable md5 ranking as :func:`quota_sample`, and
    the group size rides the SAME window partition as an unbounded
    windowed count — one shuffle total, no separate counts join."""
    from pyspark.sql import Window

    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    h = _md5_60_col(_salted_key(F.col(key_col), salt))
    w = Window.partitionBy(group_col).orderBy(
        h.asc(), F.col(key_col).asc_nulls_last()
    )
    wn = Window.partitionBy(group_col)
    cap = _isqrt_col(F.count(F.lit(1)).over(wn)) * m
    return (
        df.withColumn("__qs_rank", F.row_number().over(w))
        .withColumn("__qs_cap", cap)
        .where(F.col("__qs_rank") <= F.col("__qs_cap"))
        .drop("__qs_rank", "__qs_cap")
    )


def quota_sample_scaled_sql(
    table: str, group: str, key: str, m: int = 1, salt: str = ""
) -> str:
    """DuckDB replay of :func:`quota_sample_scaled` — same hash rank, same
    windowed count, same exact-isqrt fix-up."""
    expr = _salted_key_sql(key, salt)
    return f"""
    SELECT * EXCLUDE (__h, __r, __n, __s1, __s2, __s) FROM (
      SELECT *, __s2 - CASE WHEN __s2 * __s2 > __n THEN 1 ELSE 0 END AS __s
      FROM (
        SELECT *, __s1 + CASE WHEN (__s1 + 1) * (__s1 + 1) <= __n THEN 1 ELSE 0 END AS __s2
        FROM (
          SELECT *, ('0x' || substring(md5({expr}), 1, 15))::BIGINT AS __h,
                 ROW_NUMBER() OVER (PARTITION BY {group}
                   ORDER BY __h ASC, {key} ASC NULLS LAST) AS __r,
                 COUNT(*) OVER (PARTITION BY {group}) AS __n,
                 CAST(FLOOR(SQRT(CAST(COUNT(*) OVER (PARTITION BY {group}) AS DOUBLE))) AS BIGINT) AS __s1
          FROM {table}
        )
      )
    ) WHERE __r <= __s * {int(m)}
    """


def proportional_allocation_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    budget: int,
    salt: str = "",
) -> DataFrame:
    """Downsample to (at most) ``budget`` rows while PRESERVING the input's
    group mix — largest-remainder (Hamilton) apportionment over the group
    histogram, then the content-stable md5 pick inside each group. The
    "shrink the corpus 100x but keep its geographic/domain distribution"
    operator; per-group caps (:func:`quota_sample`) flatten the mix, this
    keeps it proportional.

    Allocation is INTEGER-exact end to end: with ``P = budget * n_g``,
    ``base_g = P div total`` and ``rem_g = P mod total`` in decimal(38,0)
    (never a float quotient — ``budget * n_g`` overflows int64 at corpus
    scale), and the ``budget - sum(base)`` leftover seats go to the
    largest ``rem_g`` (ties: ascending group key) — fully deterministic,
    engine-portable. ``sum(allocation) == budget`` whenever
    ``budget <= total`` (Hamilton invariant, property-tested); when
    ``budget >= total`` every row is kept.

    Scale shape: one map-side-combined groupBy builds the histogram; the
    apportionment runs entirely on that SMALL frame (caller contract:
    group cardinality is bounded — tiles, domains, languages — so the
    one single-partition ranking window over it is a few thousand rows,
    NOT the corpus); the allocation then broadcast-joins back and the
    per-group pick is the same ONE window shuffle as quota_sample with
    WindowGroupLimit applying per group. Rows never shuffle twice."""
    from pyspark.sql import Window

    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    total = counts.agg(F.sum("__n").cast("decimal(38,0)").alias("__total"))
    prod = F.col("__n").cast("decimal(38,0)") * F.lit(int(budget)).cast(
        "decimal(38,0)"
    )
    sized = counts.crossJoin(F.broadcast(total)).select(
        group_col,
        "__n",
        ((prod - prod % F.col("__total")) / F.col("__total"))
        .cast("long")
        .alias("__base"),
        (prod % F.col("__total")).cast("long").alias("__rem"),
    )
    # the leftover-seat rank and the base sum both live on the small
    # histogram frame; Window.partitionBy() (single partition) is
    # deliberate and safe there
    w_all = Window.partitionBy(F.lit(1))
    w_rank = w_all.orderBy(F.col("__rem").desc(), F.col(group_col).asc())
    alloc = sized.select(
        group_col,
        (
            F.col("__base")
            + (
                F.row_number().over(w_rank)
                <= F.lit(int(budget)) - F.sum("__base").over(w_all)
            ).cast("long")
        ).alias("__alloc"),
    )
    h = _md5_60_col(_salted_key(F.col(key_col), salt))
    w_pick = Window.partitionBy(group_col).orderBy(
        h.asc(), F.col(key_col).asc_nulls_last()
    )
    return (
        df.join(F.broadcast(alloc), group_col)
        .withColumn("__pa_rank", F.row_number().over(w_pick))
        .where(F.col("__pa_rank") <= F.col("__alloc"))
        .drop("__pa_rank", "__alloc")
    )


def proportional_allocation_sql(
    table: str, group: str, key: str, budget: int, salt: str = ""
) -> str:
    """DuckDB replay of :func:`proportional_allocation_sample` — same
    integer div/mod apportionment, leftover ranking and md5 pick."""
    expr = _salted_key_sql(key, salt)
    b = int(budget)
    return f"""
    SELECT * EXCLUDE (__h, __r, __alloc) FROM (
      SELECT t.*, ('0x' || substring(md5({expr}), 1, 15))::BIGINT AS __h,
             ROW_NUMBER() OVER (PARTITION BY {group}
               ORDER BY ('0x' || substring(md5({expr}), 1, 15))::BIGINT ASC,
                        {key} ASC NULLS LAST) AS __r,
             a.__alloc
      FROM {table} t JOIN (
        SELECT {group},
               CAST(__base + CASE WHEN ROW_NUMBER() OVER (
                   ORDER BY __rem DESC, {group} ASC)
                 <= {b} - SUM(__base) OVER () THEN 1 ELSE 0 END AS BIGINT)
                 AS __alloc
        FROM (
          SELECT {group},
                 CAST(({b}::HUGEINT * __n) // __total AS BIGINT) AS __base,
                 CAST(({b}::HUGEINT * __n) % __total AS BIGINT) AS __rem
          FROM (
            SELECT {group}, COUNT(*) AS __n, SUM(COUNT(*)) OVER () AS __total
            FROM {table} GROUP BY {group}
          )
        )
      ) a USING ({group})
    ) WHERE __r <= __alloc
    """


def shard_plan(
    df: DataFrame,
    key_col: str = "doc_id",
    bytes_col: str = "n_bytes",
    group_col: str = "source",
    target_bytes: int = 1 << 28,
    salt: str = "",
) -> DataFrame:
    """WebDataset-style export shard planning — assign every row to an
    output shard of ~``target_bytes``, deterministically, BEFORE any
    data moves: the write plan for turning a curated corpus into
    fixed-size training shards (tar/parquet), reproducible across
    reruns and partitionings.

    Rows are ordered content-stably inside each ``group_col`` value
    (ascending md5(salt||key), the sampling-family discipline) and
    packed greedily: ``shard_id = cum_bytes_before div target_bytes``.
    Shards are row-granular bins — a shard closes when the running sum
    crosses the target, so its size lands in
    ``(target - max_row, target + max_row)``; exact integer math
    everywhere, no floats.

    Output: ``(key, group, bytes, cum_bytes, shard_id)`` with
    ``cum_bytes`` the inclusive running sum inside the group and
    ``shard_id`` 0-based per group (writers name shards
    ``{group}-{shard_id:05d}``).

    Plan (the 100 TB story): ONE window shuffle keyed by the group —
    the same shape as quota sampling; parallelism = group count
    (sources/domains/date buckets), which is how real exports are laid
    out anyway. For a single monolithic group, pre-split the corpus
    into md5 super-shards (the ar_bucket_batches trick) and plan within
    each. The wire carries (key, group, one int64).
    """
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    from pyspark.sql import Window

    h = _md5_60_col(_salted_key(F.col(key_col), salt))
    w = (
        Window.partitionBy(group_col)
        .orderBy(h.asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    b = F.col(bytes_col).cast("long")
    with_cum = df.select(
        key_col, group_col, b.alias(bytes_col)
    ).withColumn("cum_bytes", F.sum(bytes_col).over(w))
    return with_cum.withColumn(
        "shard_id",
        F.expr(f"(cum_bytes - `{bytes_col}`) div {int(target_bytes)}"),
    )
