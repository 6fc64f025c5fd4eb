"""UI-validator operators (the reference's table-highlighting path,
``validation/checks.py:26-110``): each returns (issues, flagged-cells
DataFrame) instead of a pandas boolean mask — the distributed analogue of
the (mask, issues) contract, where the "mask" is a DataFrame of
(row_id, column) cells to highlight (collect it for a UI page; at scale a
UI only ever pages through it).

- missing_required: missing columns + blank cells       (checks.py:26-59)
- duplicate_in_column: case-insensitive keep=False dups  (checks.py:62-84)
- column_name_mismatch: headers colliding after [^a-z0-9]+ -> '_'
  normalization; driver-side on the schema                (checks.py:87-110)
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fairy_core_spark.operators.rules import nullish_pred
from fairy_core_spark.sources.tables import ROW_ID


@dataclass
class Issue:
    kind: str
    message: str
    severity: str
    row: int | None = None
    col: str | None = None
    hint: str | None = None


def missing_required(df: DataFrame, required_cols: list[str], max_cells: int = 10_000):
    """-> (issues for missing columns + up to max_cells blank-cell issues,
    flagged-cells DataFrame (row_id, column))."""
    issues: list[Issue] = []
    cells = None
    for col in required_cols:
        if col not in df.columns:
            issues.append(
                Issue(
                    kind="missing_column",
                    message=f"Required column '{col}' is missing.",
                    severity="error",
                    col=col,
                    hint="Add this column before export.",
                )
            )
            continue
        c = df.where(nullish_pred(col)).select(
            F.col(ROW_ID).alias("row_id"), F.lit(col).alias("column")
        )
        cells = c if cells is None else cells.unionByName(c)
    if cells is None:
        cells = df.sparkSession.createDataFrame([], "row_id long, column string")
    for r in cells.orderBy("row_id", "column").limit(max_cells).collect():
        issues.append(
            Issue(
                kind="missing_value",
                message=f"Missing value in required field '{r['column']}'.",
                severity="error",
                row=int(r["row_id"]) - 1,  # reference issues carry 0-based rows
                col=r["column"],
                hint="Fill this cell.",
            )
        )
    return issues, cells


def duplicate_in_column(df: DataFrame, col: str, max_cells: int = 10_000):
    """case-insensitive duplicated(keep=False) over str(values)."""
    issues: list[Issue] = []
    if col not in df.columns:
        return issues, df.sparkSession.createDataFrame([], "row_id long, column string")
    key = F.lower(F.coalesce(F.col(col).cast("string"), F.lit("None")))
    w = Window.partitionBy(key)
    marked = df.select(
        F.col(ROW_ID).alias("row_id"),
        F.col(col).cast("string").alias("__v"),
        F.count(F.lit(1)).over(w).alias("__n"),
    ).where(F.col("__n") > 1)
    for r in marked.orderBy("row_id").limit(max_cells).collect():
        issues.append(
            Issue(
                kind="duplicate_value",
                message=f"Duplicate {col} value '{r['__v']}'.",
                severity="warning",
                row=int(r["row_id"]) - 1,
                col=col,
                hint="Ensure IDs are unique.",
            )
        )
    cells = marked.select("row_id", F.lit(col).alias("column"))
    return issues, cells


def column_name_mismatch(df: DataFrame) -> list[Issue]:
    """headers colliding after lowercase + [^a-z0-9]+ -> '_' normalization;
    driver-side (schema only)."""
    issues: list[Issue] = []
    norm: dict[str, list[str]] = {}
    for c in df.columns:
        if c == ROW_ID:
            continue
        key = re.sub(r"[^a-z0-9]+", "_", c.strip().lower()).strip("_")
        norm.setdefault(key, []).append(c)
    for key, cols in norm.items():
        if len(cols) > 1:
            issues.append(
                Issue(
                    kind="column_name_mismatch",
                    message=f"Columns {cols} look like the same field (normalized '{key}').",
                    severity="warning",
                    hint=f"Keep one canonical name (e.g., '{key}'); merge or drop others.",
                )
            )
    return issues
