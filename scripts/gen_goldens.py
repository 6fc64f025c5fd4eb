"""Dev-time golden generator (run in the build sandbox only).

Runs the *reference* engine (read-only at /root/reference) on this repo's own
fixtures and freezes normalized reports under tests/golden/. The committed
test suite compares the Spark engine against these frozen goldens and never
imports the reference — the goldens pin the reference's semantics
(SURVEY.md §5 "fixture parity goldens").

Usage: python scripts/gen_goldens.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF_SRC = Path(os.environ.get("FAIRY_REFERENCE_SRC", "/root/reference/src"))

sys.path.insert(0, str(REF_SRC))

from fairy.validation.rulepack_runner import run_rulepack  # noqa: E402

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None

FIX = REPO / "tests" / "fixtures"
GOLD = REPO / "tests" / "golden"

VOLATILE_ATTESTATION_KEYS = {"core_version", "fairy_core_version", "timestamp", "dataset_id"}


def normalize(report: dict) -> dict:
    """Strip engine-identity keys (same idea as reference tests/helpers.py:6-14)."""
    out = json.loads(json.dumps(report))
    out.pop("engine", None)
    att = out.get("attestation", {})
    for k in VOLATILE_ATTESTATION_KEYS:
        att.pop(k, None)
    att["rulepack"] = {k: v for k, v in att.get("rulepack", {}).items() if k != "path"}
    att.pop("rulepack_source_path", None)
    # paths vary by checkout; keep basenames only
    for inp in att.get("inputs", []):
        inp["path"] = os.path.basename(inp["path"])
    for res in out.get("resources", []):
        res["path"] = os.path.basename(res["path"])
    md = out.get("metadata", {})
    if "inputs" in md:
        md["inputs"] = {k: os.path.basename(v) for k, v in md["inputs"].items()}
    return out


def load_rp(path: Path) -> dict:
    if path.suffix == ".json":
        return json.loads(path.read_text())
    return yaml.safe_load(path.read_text())


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


def normalize_preflight(report: dict) -> dict:
    """Strip volatile/engine-identity keys from the v1 preflight report so
    the golden pins semantics (results/summary/metadata shapes) only."""
    out = json.loads(json.dumps(report))
    out.pop("_legacy", None)
    out.pop("engine", None)
    out.pop("generated_at", None)
    out.pop("dataset_id", None)  # depends on rulepack sha of the file path
    md = out.get("metadata", {})
    for inp in md.get("inputs", {}).values():
        inp["path"] = os.path.basename(inp["path"])
    rp = md.get("rulepack", {})
    rp["path"] = os.path.basename(rp.get("path", ""))
    att = out.get("attestation", {})
    if "rulepack_source_path" in att:
        att["rulepack_source_path"] = os.path.basename(att["rulepack_source_path"])
    return out


def gen_preflight_golden() -> None:
    os.environ["FAIRY_FIXED_TIMESTAMP"] = "1970-01-01T00:00:00Z"
    from fairy.core.services.validator import run_rulepack as run_preflight_ref

    report = run_preflight_ref(
        FIX / "rulepacks" / "geo_preflight.json",
        FIX / "preflight" / "samples.tsv",
        FIX / "preflight" / "files.tsv",
        fairy_version="golden",
        params={},
    )
    norm = normalize_preflight(report)
    out = GOLD / "preflight.report.json"
    out.write_text(json.dumps(norm, indent=2, sort_keys=True) + "\n")
    print(f"wrote {out}  summary={norm['summary']}")


def gen_checks_dialect_golden() -> None:
    """Freeze RuleResult outputs of the reference checks.py dialect on the
    checks_dialect fixture (string-first read, like _read_table)."""
    import dataclasses

    import pandas as pd

    from fairy.validation import checks as rc

    df = pd.read_csv(FIX / "checks_dialect.csv", dtype=str, keep_default_na=False)
    # the reference API is typically handed frames where blanks are NaN in
    # some tests and "" in engine reads; pin the engine read (""), but NaN
    # for fully-missing homepage cells matches read_input's coalesce("")
    ref = pd.read_csv(FIX / "checks_dialect_ref.csv", dtype=str, keep_default_na=False)

    results = {
        "row_unique": rc.rr_row_unique(df, column="id"),
        "row_unique_ci": rc.rr_row_unique(df, column="id", case_insensitive=True),
        "fk_rows": rc.rr_table_foreign_key(df, ref, from_column="id", to_column="ref"),
        "numeric_range": rc.rr_column_numeric_range(df, column="price", min_value=0, max_value=1000),
        "enum_ci": rc.rr_column_enum(df, column="currency", allowed=["USD", "EUR"], case_insensitive=True),
        "enum_cs": rc.rr_column_enum(df, column="currency", allowed=["USD", "EUR"]),
        "url": rc.rr_column_url(df, column="homepage"),
        "non_empty": rc.rr_column_non_empty_trimmed(df, column="name"),
        "schema_required": rc.rr_schema_required(df, required=["id", "missing_col"]),
    }
    out = {}
    for k, v in results.items():
        out[k] = None if v is None else dataclasses.asdict(v)
    p = GOLD / "checks_dialect.json"
    p.write_text(json.dumps(out, indent=2, sort_keys=True, default=str) + "\n")
    print(f"wrote {p}")


def gen_report_v0_goldens() -> None:
    """Freeze the reference's legacy v0 dry-run payload (cli/run.py
    _build_payload) on the rna fixtures; version/run_at are volatile and
    stripped — dataset_id.sha256 stays (same file bytes in both engines)."""
    from fairy.cli.run import _build_payload

    for fix in ("rna_samples", "rna_missing_col"):
        payload, _ = _build_payload(FIX / f"{fix}.csv", kind="rna")
        payload.pop("version", None)
        payload.pop("run_at", None)
        out = GOLD / f"report_v0.{fix}.json"
        out.write_text(json.dumps(payload, indent=2, sort_keys=True) + "\n")
        print(f"wrote {out}  warnings={len(payload['warnings'])}")


def main() -> None:
    GOLD.mkdir(parents=True, exist_ok=True)
    for name, (inputs, rp_path) in CASES.items():
        rp = load_rp(rp_path)
        report = run_rulepack(inputs, rp, rp_path, "1970-01-01T00:00:00Z")
        norm = normalize(report)
        out = GOLD / f"{name}.report.json"
        out.write_text(json.dumps(norm, indent=2, sort_keys=True) + "\n")
        print(f"wrote {out}  summary={norm['summary']}")
    gen_preflight_golden()
    gen_checks_dialect_golden()
    gen_report_v0_goldens()


if __name__ == "__main__":
    main()
