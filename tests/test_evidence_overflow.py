"""Evidence-cap overflow routing: when a failing rule has more evidence rows
than the (deliberately small) driver-side cap, the full evidence set is
written to the distributed parquet sink and the report flags the truncation
— nothing is silently dropped, and the driver never holds more than the cap."""

from __future__ import annotations

import pytest

from fairy_core_spark.plans.report import run_rulepack


@pytest.fixture()
def wide_fail_csv(tmp_path):
    p = tmp_path / "t.csv"
    with open(p, "w") as f:
        f.write("id,v\n")
        for i in range(500):
            f.write(f"{i},\n")  # every v blank -> 500 evidence rows
    return str(p)


RP = {
    "meta": {"name": "overflow", "version": "0.0.1"},
    "rules": [
        {
            "id": "v-required",
            "type": "required",
            "severity": "fail",
            "config": {"pattern": "*", "columns": ["v"]},
        }
    ],
}


def test_overflow_routes_to_parquet_sink(spark, tmp_path, wide_fail_csv):
    sink = str(tmp_path / "evidence")
    rep = run_rulepack(
        spark,
        {"t": wide_fail_csv},
        RP,
        max_evidence_rows=100,
        evidence_out=sink,
    )
    res = rep["resources"][0]
    rule = res["rules"][0]
    assert rule["status"] == "FAIL"
    # driver-side evidence respects the cap
    nullish = rule["evidence"]["nullish"]["rows_by_column"]["v"]
    assert len(nullish) == 100
    # full evidence landed in the distributed sink
    assert res["evidence_truncated"]["rules"] == ["v-required"]
    full = spark.read.parquet(f"{sink}/input=t/rule=v-required")
    assert full.count() == 500


def test_exactly_cap_rows_is_not_truncated(spark, tmp_path, wide_fail_csv):
    """A result of exactly max_evidence_rows is complete — no truncation
    flag, no pointless distributed re-scan (cap+1 fetch off-by-one)."""
    rep = run_rulepack(
        spark,
        {"t": wide_fail_csv},
        RP,
        max_evidence_rows=500,  # exactly the number of failing rows
        evidence_out=str(tmp_path / "ev"),
    )
    res = rep["resources"][0]
    assert "evidence_truncated" not in res
    assert len(res["rules"][0]["evidence"]["nullish"]["rows_by_column"]["v"]) == 500


def test_no_overflow_no_sink(spark, tmp_path, wide_fail_csv):
    rep = run_rulepack(spark, {"t": wide_fail_csv}, RP, max_evidence_rows=10_000)
    res = rep["resources"][0]
    assert "evidence_truncated" not in res
    assert len(res["rules"][0]["evidence"]["nullish"]["rows_by_column"]["v"]) == 500
