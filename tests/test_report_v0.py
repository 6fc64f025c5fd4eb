"""Legacy v0 report surface parity (reference cli/run.py:25-48,127-174,
378-410 + core/models/report_v0.py): dry-run payload vs goldens frozen from
the reference engine, writer shape + determinism, markdown emitter, input
resolution error contract, and the demo alias forwarding."""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

from fairy_core_spark.plans import report_v0 as rv0

FIX = Path(__file__).parent / "fixtures"
GOLD = Path(__file__).parent / "golden"


@pytest.fixture(autouse=True)
def _need_spark(spark):
    # registry validators run on the active session
    yield


@pytest.mark.parametrize("fix", ["rna_samples", "rna_missing_col"])
def test_payload_matches_reference_golden(fix):
    payload, data = rv0.build_payload_v0(FIX / f"{fix}.csv", kind="rna")
    payload.pop("version")  # volatile: engine identity
    payload.pop("run_at")
    want = json.loads((GOLD / f"report_v0.{fix}.json").read_text())
    assert payload == want
    assert payload["dataset_id"]["sha256"] == rv0.sha256_bytes(data)


def test_write_report_v0_shape_and_determinism(tmp_path, monkeypatch):
    monkeypatch.setenv("FAIRY_FIXED_TIMESTAMP", "1970-01-01T00:00:00Z")
    payload, _ = rv0.build_payload_v0(FIX / "rna_samples.csv", kind="rna")
    meta = {
        "n_rows": payload["summary"]["n_rows"],
        "n_cols": payload["summary"]["n_cols"],
        "fields_validated": payload["summary"]["fields_validated"],
        "warnings": payload["warnings"],
    }
    p1 = rv0.write_report_v0(
        tmp_path / "a",
        filename="rna_samples.csv",
        sha256=payload["dataset_id"]["sha256"],
        meta=meta,
        input_path=FIX / "rna_samples.csv",
    )
    p2 = rv0.write_report_v0(
        tmp_path / "b",
        filename="rna_samples.csv",
        sha256=payload["dataset_id"]["sha256"],
        meta=meta,
        input_path=FIX / "rna_samples.csv",
    )
    r1, r2 = json.loads(p1.read_text()), json.loads(p2.read_text())
    assert r1 == r2  # byte-deterministic under the fixed timestamp
    assert r1["version"] == "0.1.0"
    assert r1["checks"] == [] and r1["scores"] == {"preflight": 0.0}
    # registry->v0 warning reshape: kind->check, message->failure, row->index
    w0 = r1["warnings"][0]
    assert set(w0) == {"column", "check", "failure", "index"}
    # warnings sorted by (column, index-as-string, check)
    keys = [(w["column"], str(w["index"]), w["check"]) for w in r1["warnings"]]
    assert keys == sorted(keys)
    # inputs block: project_dir-relative file path + real byte size
    assert r1["inputs"]["files"][0]["path"] == "rna_samples.csv"
    assert r1["inputs"]["files"][0]["bytes"] == (FIX / "rna_samples.csv").stat().st_size
    # schema-valid against the repo's published v0 schema
    import jsonschema

    schema = json.loads(
        (Path(__file__).parent.parent / "schemas" / "report_v0.schema.json").read_text()
    )
    jsonschema.validate(instance=r1, schema=schema)


def test_markdown_emitter(tmp_path):
    payload, _ = rv0.build_payload_v0(FIX / "rna_samples.csv", kind="rna")
    md = tmp_path / "report.md"
    rv0.emit_markdown_v0(md, payload)
    text = md.read_text()
    assert "# FAIRy Validation Report" in text
    assert "- Rows: 5" in text and "- Cols: 5" in text
    # reference quirk preserved: payload warnings have no 'code' key
    assert text.count("- warn - ") == len(payload["warnings"])

    clean = dict(payload, warnings=[])
    rv0.emit_markdown_v0(md, clean)
    assert "- None" in md.read_text()


def test_resolve_input_path_contract(tmp_path):
    assert rv0.resolve_input_path(FIX / "rna_samples.csv").name == "rna_samples.csv"
    # folder with exactly one csv resolves to it
    solo = tmp_path / "solo"
    solo.mkdir()
    shutil.copy(FIX / "rna_samples.csv", solo / "metadata.csv")
    assert rv0.resolve_input_path(solo).name == "metadata.csv"
    # empty folder / multiple csvs / missing path all raise FileNotFoundError
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError, match="No CSV file"):
        rv0.resolve_input_path(empty)
    shutil.copy(FIX / "rna_samples.csv", solo / "second.csv")
    with pytest.raises(FileNotFoundError, match="Multiple CSVs"):
        rv0.resolve_input_path(solo)
    with pytest.raises(FileNotFoundError, match="not a file or directory"):
        rv0.resolve_input_path(tmp_path / "nope")


def test_cli_run_dry_run_and_write(tmp_path):
    """End-to-end through the CLI in a subprocess (its own Spark session)."""
    env = {"FAIRY_FIXED_TIMESTAMP": "1970-01-01T00:00:00Z"}
    import os

    env = {**os.environ, **env}
    out = subprocess.run(
        [sys.executable, "-m", "fairy_core_spark.cli", "run",
         "--input", str(FIX / "rna_samples.csv"), "--dry-run"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    payload = json.loads(out.stdout[out.stdout.index("{"):])
    assert payload["summary"]["n_rows"] == 5
    assert payload["run_at"] == "1970-01-01T00:00:00Z"

    out_dir = tmp_path / "reports"
    out = subprocess.run(
        [sys.executable, "-m", "fairy_core_spark.cli", "run",
         "--input", str(FIX / "rna_samples.csv"), "--out", str(out_dir)],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert (out_dir / "report.json").exists() and (out_dir / "report.md").exists()
    rep = json.loads((out_dir / "report.json").read_text())
    assert rep["summary"]["n_rows"] == 5 and len(rep["warnings"]) == 4


def test_demo_alias_forwards_with_deprecation():
    code = (
        "import sys; sys.argv = ['fairy-demo', '--input', "
        f"{str(FIX / 'rna_samples.csv')!r}, '--dry-run']; "
        "from fairy_core_spark.cli import demo_alias_main; "
        "raise SystemExit(demo_alias_main())"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "deprecated" in out.stderr
    payload = json.loads(out.stdout[out.stdout.index("{"):])
    assert payload["summary"]["n_rows"] == 5


def test_cli_version_text():
    out = subprocess.run(
        [sys.executable, "-m", "fairy_core_spark.cli", "--version"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0
    assert "fairy_core_version:" in out.stdout
    assert "rulepack_version: 0.0.0" in out.stdout
