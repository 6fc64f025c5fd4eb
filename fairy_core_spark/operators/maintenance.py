"""Lakehouse table-maintenance planning over FILE METADATA (the Iceberg
manifest analog in sources/tables.ParquetDirCatalog) — never over data.

A 10^12-image table accretes small files from streaming ingest and
per-partition writers; the standard maintenance action is bin-packing
rewrites (Iceberg's binPack strategy). The planning step here is pure
metadata arithmetic and therefore exactly DuckDB-replayable:

- files at or above ``target_bytes`` are kept as-is (``action='keep'`` —
  rewriting them buys nothing);
- smaller files are assigned to rewrite groups by CUMULATIVE FILL inside
  each table partition: ordered by file id, a file joins bin
  ``floor(preceding_small_bytes / target_bytes)``. Closed form (one window
  sum, no stateful reset), deterministic, and every bin's total is
  < target_bytes + the largest member, i.e. < 2x target — the same bound
  Iceberg's greedy packer gives.

Scale: the window partitions by the table partition columns (compaction
never merges across partitions), so the only ordering is within one
partition's manifest rows — metadata cardinality, not data cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    file_col: str = "path",
    bytes_col: str = "bytes",
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """files + (action, group_id): 'keep' (group_id NULL) for files already
    at/above ``target_bytes``; 'rewrite' with a per-partition bin number
    for the rest. Deterministic in (partition, file id) only."""
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    small = F.col(bytes_col) < F.lit(int(target_bytes))
    w = (
        Window.partitionBy(*[F.col(c) for c in partition_cols])
        .orderBy(file_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(
        F.sum(F.when(small, F.col(bytes_col))).over(w), F.lit(0)
    )
    return files.select(
        "*",
        F.when(small, F.lit("rewrite")).otherwise(F.lit("keep")).alias("action"),
        F.when(small, F.floor(prior / F.lit(int(target_bytes)))).alias("group_id"),
    )


def compaction_plan_sql(
    files_rel: str,
    target_bytes: int,
    file_col: str = "path",
    bytes_col: str = "bytes",
    partition_cols: tuple[str, ...] = (),
) -> str:
    """DuckDB twin of :func:`compaction_plan` over ``files_rel`` (a table
    name or parenthesized subquery) — same window, same closed form."""
    part = (
        "PARTITION BY " + ", ".join(partition_cols) + " " if partition_cols else ""
    )
    t = int(target_bytes)
    return f"""
    SELECT *,
      CASE WHEN {bytes_col} < {t} THEN 'rewrite' ELSE 'keep' END AS action,
      CASE WHEN {bytes_col} < {t} THEN CAST(FLOOR(COALESCE(SUM(
          CASE WHEN {bytes_col} < {t} THEN {bytes_col} END
        ) OVER ({part}ORDER BY {file_col}
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        / {t}) AS BIGINT) END AS group_id
    FROM {files_rel}
    """
