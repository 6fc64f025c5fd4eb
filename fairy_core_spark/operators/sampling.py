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


def _hash_bucket(col: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, 10000) from md5(salt || key) — the
    engine-portable hash (see dedup._md5_60 for why md5, not xxhash64)."""
    salted = F.concat(F.lit(salt), col.cast("string")) if salt else col.cast("string")
    return (F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long") % _BUCKETS).cast("int")


def hash_bucket_sql(key: str, salt: str = "") -> str:
    """DuckDB replay of :func:`_hash_bucket` (oracle building block)."""
    expr = f"'{salt}' || CAST({key} AS VARCHAR)" if salt else f"CAST({key} AS VARCHAR)"
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
