"""RuleResult-dialect rule operators (the reference's newer checks API,
``src/fairy/validation/checks.py:113-369``) — Spark-native.

The semantics deliberately differ from the rulepack-runner dialect
(operators/rules.py) and both dialects are part of the engine's surface
(SURVEY.md §2.3):

- ``row.unique`` counts ALL members of duplicate groups (keep=False), with
  the last-two-indices-per-group sample policy (checks.py:150-189)
- ``column.numeric_range``: NULLS PASS (violation = out-of-bounds or
  non-numeric-but-present; checks.py:253)
- ``column.enum``: NULLS PASS (checks.py:344-369); case_insensitive flag
- ``table.foreign_key`` counts per-ROW violations, not distinct values
  (checks.py:193-230)

Each operator returns ``RuleResult | None`` (None == pass), with <=10
deterministic samples (1-based rows) collected via sorted/limited scans —
counts always aggregate distributed first; evidence scans run only on
failure.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fairy_core_spark.operators.rules import non_empty_trimmed_pred, url_invalid_pred
from fairy_core_spark.sources.tables import ROW_ID


@dataclass
class Sample:
    row: int
    value: Any = None
    detail: str | None = None


@dataclass
class RuleResult:
    id: str
    level: str  # fail | warn | info
    count: int
    samples: list[Sample] = field(default_factory=list)
    meta: dict[str, Any] = field(default_factory=dict)


def _collect_samples(df: DataFrame, pred, value_col, limit: int = 10) -> list[Sample]:
    rows = (
        df.where(pred)
        .select(F.col(ROW_ID), value_col.alias("__v"))
        .orderBy(ROW_ID)
        .limit(limit)
        .collect()
    )
    return [Sample(row=int(r[ROW_ID]), value=r["__v"]) for r in rows]


def rr_schema_required(df: DataFrame, required: list[str], level: str = "fail") -> RuleResult | None:
    """column-presence only (checks.py:133-146)."""
    missing = [c for c in required if c not in df.columns]
    if not missing:
        return None
    samples = [Sample(row=0, value=c, detail="missing column") for c in sorted(missing)[:10]]
    return RuleResult(
        "schema.required", level, len(missing), samples,
        {"required": list(required), "missing": missing},
    )


def rr_row_unique(
    df: DataFrame, column: str, level: str = "fail", case_insensitive: bool = False
) -> RuleResult | None:
    """duplicated(keep=False): count all dup-group members; samples = last
    two row ids per group, globally sorted, <=10 (checks.py:150-189)."""
    if column not in df.columns:
        return rr_schema_required(df, [column], level)
    key = F.col(column).cast("string")
    if case_insensitive:
        key = F.lower(key)
    grouped = df.groupBy(key.alias("__k")).agg(F.count(F.lit(1)).alias("n"))
    total = grouped.where(F.col("n") > 1).agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("t")
    ).collect()[0]["t"]
    if total == 0:
        return None
    w_cnt = Window.partitionBy(key)
    w_last = Window.partitionBy(key).orderBy(F.desc(ROW_ID))
    marked = df.select(
        F.col(ROW_ID), F.col(column).alias("__v"),
        F.count(F.lit(1)).over(w_cnt).alias("__n"),
        F.row_number().over(w_last).alias("__last"),
    )
    rows = (
        marked.where((F.col("__n") > 1) & (F.col("__last") <= 2))
        .orderBy(ROW_ID)
        .limit(10)
        .collect()
    )
    samples = [Sample(row=int(r[ROW_ID]), value=r["__v"]) for r in rows]
    return RuleResult(
        "row.unique", level, int(total), samples,
        {"column": column, "case_insensitive": case_insensitive},
    )


def rr_table_foreign_key(
    df_from: DataFrame, df_to: DataFrame, from_column: str, to_column: str, level: str = "fail"
) -> RuleResult | None:
    """per-ROW violations, stable row order of samples (checks.py:193-230)."""
    errs = []
    if from_column not in df_from.columns:
        errs.append(("from", from_column))
    if to_column not in df_to.columns:
        errs.append(("to", to_column))
    if errs:
        samples = [Sample(row=0, value=f"{side}.{col}", detail="missing column") for side, col in errs]
        return RuleResult(
            "table.foreign_key", level, len(errs), samples,
            {"from_column": from_column, "to_column": to_column, "error": "missing columns"},
        )
    ref = df_to.select(F.col(to_column).alias("__k")).where(F.col("__k").isNotNull()).distinct()
    src = df_from.select(F.col(ROW_ID), F.col(from_column).alias("__k")).where(
        F.col("__k").isNotNull()
    )
    bad = src.join(ref, "__k", "left_anti")
    count = bad.count()
    if count == 0:
        return None
    rows = bad.orderBy(ROW_ID).limit(10).collect()
    samples = [Sample(row=int(r[ROW_ID]), value=r["__k"]) for r in rows]
    return RuleResult(
        "table.foreign_key", level, int(count), samples,
        {"from_column": from_column, "to_column": to_column},
    )


def rr_column_numeric_range(
    df: DataFrame,
    column: str,
    min_value: float | None = None,
    max_value: float | None = None,
    level: str = "fail",
) -> RuleResult | None:
    """NULLS PASS: violation = out-of-bounds OR present-but-non-numeric
    (checks.py:234-266); reports non_numeric_count separately."""
    if column not in df.columns:
        return rr_schema_required(df, [column], level)
    orig = F.col(column)
    d = orig.cast("string").try_cast("double")
    oob = F.lit(False)
    if min_value is not None:
        oob = oob | (d < float(min_value))
    if max_value is not None:
        oob = oob | (d > float(max_value))
    nonnum = d.isNull() & orig.isNotNull()
    bad = F.coalesce(oob, F.lit(False)) | nonnum
    aggs = df.agg(
        F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias("n"),
        F.sum(F.when(nonnum, 1).otherwise(0)).cast("long").alias("nn"),
    ).collect()[0]
    if int(aggs["n"] or 0) == 0:
        return None
    samples = _collect_samples(df, bad, orig.cast("string"))
    return RuleResult(
        "column.numeric_range", level, int(aggs["n"]), samples,
        {
            "column": column,
            "min": min_value,
            "max": max_value,
            "non_numeric_count": int(aggs["nn"] or 0),
        },
    )


def rr_column_enum(
    df: DataFrame,
    column: str,
    allowed: list[str],
    level: str = "warn",
    case_insensitive: bool = False,
) -> RuleResult | None:
    """NULLS PASS: violation = notna & ~isin (checks.py:344-369)."""
    if column not in df.columns:
        return rr_schema_required(df, [column], level)
    c = F.col(column).cast("string")
    norm = F.lower(c) if case_insensitive else c
    allow = sorted({str(a).lower() for a in allowed} if case_insensitive else {str(a) for a in allowed})
    bad = c.isNotNull() & ~norm.isin(allow)
    count = df.where(bad).count()
    if count == 0:
        return None
    samples = _collect_samples(df, bad, c)
    return RuleResult(
        "column.enum", level, int(count), samples,
        {"column": column, "allowed_count": len(allow)},
    )


def rr_column_url(
    df: DataFrame, column: str, schemes: list[str] | None = None, level: str = "fail"
) -> RuleResult | None:
    """same URL predicate as the rulepack dialect; per-row count
    (checks.py:270-316)."""
    if column not in df.columns:
        return rr_schema_required(df, [column], level)
    bad = url_invalid_pred(column, schemes)
    count = df.where(bad).count()
    if count == 0:
        return None
    samples = _collect_samples(df, bad, F.col(column).cast("string"))
    return RuleResult(
        "column.url", level, int(count), samples,
        {"column": column, "schemes": sorted(set(schemes or ("http", "https")))},
    )


def rr_column_non_empty_trimmed(
    df: DataFrame, column: str, level: str = "warn"
) -> RuleResult | None:
    """isna OR blank; sample detail 'NA' vs stripped length (checks.py:320-340)."""
    if column not in df.columns:
        return rr_schema_required(df, [column], level)
    bad = non_empty_trimmed_pred(column)
    count = df.where(bad).count()
    if count == 0:
        return None
    rows = (
        df.where(bad)
        .select(
            F.col(ROW_ID),
            F.col(column).cast("string").alias("__v"),
            F.length(F.trim(F.col(column).cast("string"))).alias("__len"),
        )
        .orderBy(ROW_ID)
        .limit(10)
        .collect()
    )
    samples = [
        Sample(
            row=int(r[ROW_ID]),
            value=r["__v"],
            detail="NA" if r["__v"] is None else f"len(stripped)={r['__len']}",
        )
        for r in rows
    ]
    return RuleResult(
        "column.non_empty_trimmed", level, int(count), samples, {"column": column}
    )
