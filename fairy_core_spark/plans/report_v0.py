"""Legacy v0 report surface — the reference's original single-CSV
summarize command (reference ``cli/run.py:25-48,127-151,378-410``,
``core/models/report_v0.py:1-65``, ``core/services/report_writer.py:70-133``),
rebuilt on this engine's validation registry
(:mod:`fairy_core_spark.validation_api`, whose validators run as Spark
plans).

Two output shapes, mirroring the reference exactly:

- the **dry-run payload** (``_build_payload``): validation warnings pass
  through in registry shape (column/kind/message/severity/row/hint);
- the **written report.json** (``write_report``): warnings re-shaped into
  the v0 model (column/check/failure/index), deterministically sorted,
  wrapped with inputs/checks/scores and schema-validated against
  ``schemas/report_v0.schema.json``.

The v0 surface is driver-side plumbing around one registry validation; the
validation itself is a Spark plan, so the same command works against a
100 TB table (only the capped warning list ever reaches the driver).
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import json
from dataclasses import asdict, dataclass, field
from pathlib import Path
from typing import Any

from fairy_core_spark.plans.provenance import fixed_timestamp_or
from fairy_core_spark.validation_api import validate_csv

V0_VERSION = "0.1.0"  # pinned report version (reference report_writer.py:104)


def _now_iso() -> str:
    """UTC timestamp with trailing Z; FAIRY_FIXED_TIMESTAMP overrides for
    deterministic goldens (same hook as the v1 report writer)."""
    return fixed_timestamp_or(
        _dt.datetime.now(_dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
    )


# ---------------------------------------------------------- v0 model shapes
# mirror of reference core/models/report_v0.py:8-65


@dataclass
class InputFile:
    path: str
    bytes: int


@dataclass
class Inputs:
    project_dir: str
    files: list[InputFile]


@dataclass
class DatasetId:
    filename: str
    sha256: str


@dataclass
class RulepackRef:
    name: str
    version: str


@dataclass
class Provenance:
    license: str | None = None
    source_url: str | None = None
    notes: str | None = None


@dataclass
class SummaryV0:
    n_rows: int
    n_cols: int
    fields_validated: list[str]


@dataclass
class WarningItemV0:
    column: str
    check: str
    failure: str
    index: int


@dataclass
class ReportV0:
    version: str
    run_at: str
    dataset_id: DatasetId
    summary: SummaryV0
    warnings: list[WarningItemV0] = field(default_factory=list)
    rulepacks: list[RulepackRef] = field(default_factory=list)
    provenance: Provenance = field(default_factory=Provenance)
    inputs: Inputs = field(default_factory=lambda: Inputs(project_dir=".", files=[]))
    checks: list[dict[str, Any]] = field(default_factory=list)
    scores: dict[str, float] = field(default_factory=lambda: {"preflight": 0.0})


# ------------------------------------------------------------------ helpers


def sha256_bytes(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()


def resolve_input_path(p: str | Path) -> Path:
    """A direct CSV file, or a dataset directory containing exactly one CSV
    (reference cli/run.py:153-174 — same error contract)."""
    p = Path(p)
    if p.is_file():
        return p
    if p.is_dir():
        csvs = sorted(p.glob("*.csv"))
        if len(csvs) == 1:
            return csvs[0]
        if not csvs:
            raise FileNotFoundError(
                f"No CSV file found in directory {p}. Expected something like metadata.csv."
            )
        names = ", ".join(c.name for c in csvs)
        raise FileNotFoundError(
            f"Multiple CSVs found in {p}: {names}. Please specify which file you want."
        )
    raise FileNotFoundError(f"{p} is not a file or directory")


def _engine_version() -> str:
    from fairy_core_spark.plans.report import ENGINE_VERSION

    return ENGINE_VERSION


# ------------------------------------------------------------ dry-run payload


def build_payload_v0(csv_path: str | Path, kind: str = "rna") -> tuple[dict, bytes]:
    """The v0 payload dict + raw file bytes (reference cli/run.py:127-151):
    registry-shaped warnings, sorted fields_validated, empty rulepacks,
    null provenance, preflight score 0.0."""
    csv_path = Path(csv_path)
    data_bytes = csv_path.read_bytes()
    meta = validate_csv(str(csv_path), kind=kind)
    payload = {
        "version": _engine_version(),
        "run_at": _now_iso(),
        "dataset_id": {"filename": csv_path.name, "sha256": sha256_bytes(data_bytes)},
        "summary": {
            "n_rows": meta.n_rows,
            "n_cols": meta.n_cols,
            "fields_validated": sorted(meta.fields_validated),
        },
        "warnings": [w.__dict__ for w in meta.warnings],
        "rulepacks": [],
        "provenance": {"license": None, "source_url": None, "notes": None},
        "scores": {"preflight": 0.0},
    }
    return payload, data_bytes


# ----------------------------------------------------------------- md emitter


def emit_markdown_v0(md_path: str | Path, payload: dict) -> None:
    """Small markdown summary of a v0 payload (reference cli/run.py:25-48;
    faithfully keeps its quirk of labelling every warning line with the
    'code' fallback 'warn', since payload warnings carry 'kind' not 'code')."""
    md_path = Path(md_path)
    checks = payload.get("warnings", [])
    lines = [
        "# FAIRy Validation Report",
        "",
        f"**Run at:** {payload.get('run_at', '')}",
        f"**File:** {payload.get('dataset_id', {}).get('filename', '')}",
        f"**SHA256:** {payload.get('dataset_id', {}).get('sha256', '')}",
        "",
        "## Summary",
        f"- Rows: {payload.get('summary', {}).get('n_rows', '?')}",
        f"- Cols: {payload.get('summary', {}).get('n_cols', '?')}",
        f"- Fields validated: {len(payload.get('summary', {}).get('fields_validated', []))}",
        "",
        "## Warnings",
    ]
    if not checks:
        lines.append("- None")
    else:
        for w in checks:
            lines.append(f"- {w.get('code', 'warn')} - {w.get('message', '')}")
    md_path.parent.mkdir(parents=True, exist_ok=True)
    md_path.write_text("\n".join(lines), encoding="utf-8")


# --------------------------------------------------------------- json writer


def _posix_rel(child: Path, root: Path) -> str:
    try:
        rel = child.resolve().relative_to(root.resolve())
    except ValueError:
        rel = child.resolve()
    return rel.as_posix()


def _registry_warning_to_v0(w: dict) -> WarningItemV0:
    """Registry shape (column/kind/message/severity/row/hint) -> v0 model
    shape (column/check/failure/index, report_v0.py:47-52)."""
    return WarningItemV0(
        column=w.get("column") or "",
        check=w.get("kind") or w.get("check") or "",
        failure=w.get("message") or w.get("failure") or "",
        index=w.get("row") if w.get("row") is not None else w.get("index", -1),
    )


def write_report_v0(
    out_dir: str | Path,
    *,
    filename: str,
    sha256: str,
    meta: dict,
    rulepacks: list[dict] | None = None,
    provenance: dict | None = None,
    input_path: str | Path | None = None,
) -> Path:
    """Write ``report.json`` in the full v0 shape (reference
    report_writer.py:70-133): deterministic warning/rulepack ordering,
    inputs block with project_dir-relative file paths, empty checks,
    schema-validated before writing."""
    out_path = Path(out_dir)
    out_path.mkdir(parents=True, exist_ok=True)

    if input_path is not None:
        project_dir = Path(input_path).resolve().parent
        data_file = Path(input_path).resolve()
    else:
        project_dir = Path.cwd().resolve()
        data_file = (project_dir / filename).resolve()

    files = []
    if data_file.exists():
        files = [InputFile(path=_posix_rel(data_file, project_dir), bytes=data_file.stat().st_size)]

    warnings_list = [_registry_warning_to_v0(w) for w in meta.get("warnings", [])]
    # reference sorts by RAW index (report_writer.py:99: (column, index,
    # check)) — numeric, not lexicographic ('10' < '2' would diverge for
    # indices spanning digit counts); None-safe via -1 (reference rows
    # always carry int indices, so the sentinel never reorders real data)
    warnings_list.sort(
        key=lambda w: (
            w.column or "",
            w.index if isinstance(w.index, int) else -1,
            w.check or "",
        )
    )
    rulepacks_list = sorted(
        (RulepackRef(**rp) for rp in (rulepacks or [])), key=lambda r: (r.name, r.version)
    )

    report = ReportV0(
        version=V0_VERSION,
        run_at=_now_iso(),
        dataset_id=DatasetId(filename=filename, sha256=sha256),
        summary=SummaryV0(
            n_rows=int(meta.get("n_rows", 0)),
            n_cols=int(meta.get("n_cols", 0)),
            fields_validated=sorted(meta.get("fields_validated", [])),
        ),
        warnings=warnings_list,
        rulepacks=rulepacks_list,
        provenance=Provenance(**(provenance or {})),
        inputs=Inputs(project_dir=str(project_dir), files=files),
        checks=[],
        scores={"preflight": 0.0},
    )
    report_dict = asdict(report)

    schema_path = Path(__file__).resolve().parent.parent.parent / "schemas" / "report_v0.schema.json"
    if schema_path.exists():
        try:
            import jsonschema

            jsonschema.validate(instance=report_dict, schema=json.loads(schema_path.read_text()))
        except ImportError:
            pass  # schema check is best-effort; the dataclass shape is the contract

    path = out_path / "report.json"
    path.write_text(
        json.dumps(report_dict, ensure_ascii=False, indent=2, sort_keys=True) + "\n",
        encoding="utf-8",
    )
    return path
