"""Preflight v1 report parity: the Spark preflight runner must reproduce the
reference's report (results, samples, summary, metadata shapes) on the GEO
fixture — golden frozen from the reference engine by scripts/gen_goldens.py."""

from __future__ import annotations

import json
import os
from pathlib import Path

from fairy_core_spark.plans.preflight_report import run_preflight, write_preflight_outputs

FIX = Path(__file__).parent / "fixtures"
GOLD = Path(__file__).parent / "golden"


def normalize_preflight(report: dict) -> dict:
    out = json.loads(json.dumps(report))
    out.pop("_legacy", None)
    out.pop("engine", None)
    out.pop("generated_at", None)
    out.pop("dataset_id", None)
    md = out.get("metadata", {})
    for inp in md.get("inputs", {}).values():
        inp["path"] = os.path.basename(inp["path"])
    rp = md.get("rulepack", {})
    rp["path"] = os.path.basename(rp.get("path", ""))
    att = out.get("attestation", {})
    if "rulepack_source_path" in att:
        att["rulepack_source_path"] = os.path.basename(att["rulepack_source_path"])
    return out


def test_preflight_report_matches_reference_golden(spark, tmp_path):
    rp_path = FIX / "rulepacks" / "geo_preflight.json"
    rulepack = json.loads(rp_path.read_text())
    report = run_preflight(
        spark,
        rulepack,
        str(rp_path),
        str(FIX / "preflight" / "samples.tsv"),
        str(FIX / "preflight" / "files.tsv"),
        params={},
    )
    got = normalize_preflight(report)
    want = json.loads((GOLD / "preflight.report.json").read_text())
    assert got["summary"] == want["summary"]
    assert got["results"] == want["results"]
    assert got["metadata"]["inputs"] == want["metadata"]["inputs"]
    assert got["schema_version"] == want["schema_version"] == "1.0.0"

    # artifact layout contract (reference test_cli_preflight_geo_contract.py)
    out_dir = str(tmp_path / "out")
    write_preflight_outputs(report, out_dir)
    assert os.path.exists(f"{out_dir}/preflight_report.json")
    assert os.path.exists(f"{out_dir}/preflight_report.md")
    # exit-code contract: not submission_ready -> 1
    assert report["summary"]["submission_ready"] is False
