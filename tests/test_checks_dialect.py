"""RuleResult-dialect parity: Spark operators/checks.py vs the reference
checks.py golden (tests/golden/checks_dialect.json, frozen by
scripts/gen_goldens.py). This is the dialect whose null semantics
*deliberately differ* from the rulepack runner (SURVEY.md §2.3)."""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import pytest

from fairy_core_spark.operators import checks as cc
from fairy_core_spark.sources.tables import read_input

FIX = Path(__file__).parent / "fixtures"
GOLD = Path(__file__).parent / "golden"


@pytest.fixture(scope="module")
def dfs(spark):
    df = read_input(spark, str(FIX / "checks_dialect.csv"), row_id=True).cache()
    ref = read_input(spark, str(FIX / "checks_dialect_ref.csv"), row_id=True).cache()
    return df, ref


@pytest.fixture(scope="module")
def golden():
    return json.loads((GOLD / "checks_dialect.json").read_text())


def _norm(rr) -> dict | None:
    if rr is None:
        return None
    d = dataclasses.asdict(rr)
    # golden serialized pandas values via str; normalize both to str-or-None
    for s in d["samples"]:
        if s["value"] is not None:
            s["value"] = str(s["value"])
    return d


def _norm_golden(g: dict | None) -> dict | None:
    if g is None:
        return None
    for s in g["samples"]:
        if s["value"] is not None:
            s["value"] = str(s["value"])
    return g


CASES = [
    ("row_unique", lambda df, ref: cc.rr_row_unique(df, "id")),
    ("row_unique_ci", lambda df, ref: cc.rr_row_unique(df, "id", case_insensitive=True)),
    ("fk_rows", lambda df, ref: cc.rr_table_foreign_key(df, ref, "id", "ref")),
    (
        "numeric_range",
        lambda df, ref: cc.rr_column_numeric_range(df, "price", min_value=0, max_value=1000),
    ),
    ("enum_ci", lambda df, ref: cc.rr_column_enum(df, "currency", ["USD", "EUR"], case_insensitive=True)),
    ("enum_cs", lambda df, ref: cc.rr_column_enum(df, "currency", ["USD", "EUR"])),
    ("url", lambda df, ref: cc.rr_column_url(df, "homepage")),
    ("non_empty", lambda df, ref: cc.rr_column_non_empty_trimmed(df, "name")),
    ("schema_required", lambda df, ref: cc.rr_schema_required(df, ["id", "missing_col"])),
]


@pytest.mark.parametrize("name,fn", CASES, ids=[c[0] for c in CASES])
def test_checks_dialect_matches_reference(dfs, golden, name, fn):
    df, ref = dfs
    got = _norm(fn(df, ref))
    want = _norm_golden(golden[name])
    assert got == want
