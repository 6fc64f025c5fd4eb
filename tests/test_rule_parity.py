"""Fixture-parity goldens: the Spark rulepack runner must reproduce the
reference engine's reports bit-for-bit (evidence rows, counts, statuses,
summary) on the recast rule fixtures (SURVEY.md §5 item 1).

Goldens under tests/golden/ were frozen from the reference engine by
scripts/gen_goldens.py; this suite never imports the reference.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from fairy_core_spark.plans.report import run_rulepack
from fairy_core_spark.rulepack.loader import load_rulepack
from tests.helpers import normalize_report

FIX = Path(__file__).parent / "fixtures"
GOLD = Path(__file__).parent / "golden"

CASES = {
    "penguins": (
        {"penguins_small": FIX / "penguins_small.csv"},
        FIX / "rulepacks" / "penguins.yml",
    ),
    "art": (
        {"artworks": FIX / "artworks_fail.csv", "artists": FIX / "artists.csv"},
        FIX / "rulepacks" / "art.yaml",
    ),
    "regex_demo": (
        {"regex_demo": FIX / "regex_demo.csv"},
        FIX / "rulepacks" / "regex_demo.yaml",
    ),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_report_matches_reference_golden(spark, case):
    inputs, rp_path = CASES[case]
    rp = load_rulepack(str(rp_path))
    report = run_rulepack(
        spark,
        {k: str(v) for k, v in inputs.items()},
        rp,
        rp_path=str(rp_path),
        now_iso="1970-01-01T00:00:00Z",
    )
    got = normalize_report(report)
    want = json.loads((GOLD / f"{case}.report.json").read_text())
    assert got == want
