"""CLI preflight artifact contract + profiles registry (reference
tests/integration/test_cli_preflight_geo_contract.py:13-50,
cmd_preflight.py:231-295, preflight_profiles.py:26-51,117-162):
the 4-artifact output layout, hard-fail on missing inputs without creating
out_dir, profile selection, and report schema drift guard."""

from __future__ import annotations

import json
import os

import pytest

from fairy_core_spark.cli import main

RP = "tests/fixtures/rulepacks/geo_preflight.json"
SAMPLES = "tests/fixtures/preflight/samples.tsv"
FILES = "tests/fixtures/preflight/files.tsv"

EXPECTED_ARTIFACTS = [
    "preflight_report.json",
    "preflight_report.md",
    "manifest.json",
    os.path.join("artifacts", "inputs_manifest.json"),
]


def _run_preflight(out_dir, profile=None, files=FILES):
    argv = [
        "preflight",
        "--rulepack", RP,
        "--samples", SAMPLES,
        "--files", files,
        "--out-dir", str(out_dir),
    ]
    if profile:
        argv.append(profile)
    return main(argv)


def test_preflight_creates_required_artifacts(spark, tmp_path):
    out = tmp_path / "fairy-out"
    _run_preflight(out)
    missing = [a for a in EXPECTED_ARTIFACTS if not (out / a).exists()]
    assert not missing, f"missing artifacts: {missing}"

    manifest = json.loads((out / "manifest.json").read_text())
    assert manifest["schema_version"] == "1.0.0"
    assert manifest["source_report"] == "preflight_report.json"
    assert {f["path"] for f in manifest["files"]} == {
        "preflight_report.json",
        "preflight_report.md",
        "artifacts/inputs_manifest.json",
    }
    for f in manifest["files"]:
        assert len(f["sha256"]) == 64 and f["role"] in ("report", "metadata", "other")

    im = json.loads((out / "artifacts" / "inputs_manifest.json").read_text())
    assert im["schema_version"] == "inputs-manifest/v0"
    assert [i["name"] for i in im["inputs"]] == ["samples", "files"]
    assert all(len(i["sha256"]) == 64 for i in im["inputs"])


def test_preflight_missing_files_hard_fails_no_out_dir(spark, tmp_path):
    out = tmp_path / "fairy-out"
    rc = _run_preflight(out, files=str(tmp_path / "MISSING.tsv"))
    assert rc == 2
    assert not out.exists()


def test_preflight_profile_selection(spark, tmp_path):
    # generic profile runs the same 2-table engine; geo is the default
    out = tmp_path / "generic-out"
    _run_preflight(out, profile="generic")
    assert (out / "preflight_report.json").exists()

    rc = _run_preflight(tmp_path / "bad-out", profile="not-a-profile")
    assert rc == 2


def test_profiles_registry_contract():
    from fairy_core_spark.plans.preflight_profiles import (
        PreflightProfile,
        ProfileNotFoundError,
        ProfilesRegistry,
        get_registry,
    )

    reg = get_registry()
    assert reg.list_profile_ids() == ["generic", "geo", "spellbook"]
    with pytest.raises(ProfileNotFoundError):
        reg.get("nope")
    r2 = ProfilesRegistry()
    p = PreflightProfile(id="x", description="d", runner=lambda **kw: {})
    r2.register(p)
    with pytest.raises(ValueError):
        r2.register(p)  # duplicate id


def test_report_validates_against_locked_schema(spark, tmp_path):
    """Schema drift guard (reference tests/schema/test_schema_drift_guard.py:
    22-61): version const locked + full jsonschema validation of a real
    report, independent of goldens."""
    import jsonschema

    schema = json.loads(open("schemas/preflight_report_v1.schema.json").read())
    assert schema["properties"]["schema_version"]["const"] == "1.0.0"
    required = {"schema_version", "generated_at", "dataset_id", "metadata", "summary", "results"}
    assert required <= set(schema["properties"])
    assert required <= set(schema["required"])
    summary_props = schema["properties"]["summary"]
    assert {"by_level", "by_rule", "submission_ready"} <= set(summary_props["properties"])

    out = tmp_path / "schema-out"
    _run_preflight(out)
    report = json.loads((out / "preflight_report.json").read_text())
    jsonschema.validate(report, schema)  # raises on drift


def test_validate_legacy_positional_modes(spark, tmp_path, capsys):
    """reference cli/validate.py:88-110: positional INPUT as single file
    (named 'default') or folder (stem-named CSVs); error contracts exit 2
    before Spark work."""
    import shutil

    # folder mode over the art fixtures (rulepack patterns match filenames)
    folder = tmp_path / "csvs"
    folder.mkdir()
    shutil.copy("tests/fixtures/artworks_fail.csv", folder / "artworks.csv")
    shutil.copy("tests/fixtures/artists.csv", folder / "artists.csv")
    rc = main([
        "validate", str(folder), "--rulepack", "tests/fixtures/rulepacks/art.yaml",
    ])
    assert rc == 1  # failing rules present -> exit 1 (ran end-to-end)

    # missing input / missing rulepack / empty folder -> 2
    assert main(["validate", "--rulepack", "tests/fixtures/rulepacks/art.yaml"]) == 2
    assert main(["validate", str(folder), "--rulepack", str(tmp_path / "nope.yaml")]) == 2
    empty = tmp_path / "empty"
    empty.mkdir()
    assert main(["validate", str(empty), "--rulepack", "tests/fixtures/rulepacks/art.yaml"]) == 2


def test_rulepack_shape_check(tmp_path, capsys):
    """reference cmd_rulepack.py:23-34: loads + reports shape, exit 2 on a
    malformed pack, no Spark session started."""
    rc = main(["rulepack", "--rulepack", "tests/fixtures/rulepacks/art.yaml",
               "--inputs", "a=x.csv"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Loaded rulepack" and "rule(s)" in out
    assert "Inputs parsed: a=x.csv" in out

    bad = tmp_path / "bad.json"
    bad.write_text("[1, 2, 3]")  # not a mapping
    assert main(["rulepack", "--rulepack", str(bad)]) == 2


def test_preflight_missing_param_file_hard_fails_no_out_dir(spark, tmp_path):
    """--param-file joins the pre-Spark input existence check: a missing
    param file is a bad-input exit 2 with no out_dir, not a traceback after
    Spark boots."""
    out = tmp_path / "fairy-out"
    rc = main([
        "preflight",
        "--rulepack", RP,
        "--samples", SAMPLES,
        "--files", FILES,
        "--out-dir", str(out),
        "--param-file", str(tmp_path / "MISSING.yml"),
    ])
    assert rc == 2
    assert not out.exists()
