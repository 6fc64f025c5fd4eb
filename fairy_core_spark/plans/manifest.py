"""Manifest v1 + role inference + export bundling.

Same contract as the reference (``core/services/manifest.py:15-85``,
``core/services/export_adapter.py:31-34,138-146,181-240``):

- manifest v1: schema_version/dataset_id/created_at/hash_algorithm/rulepack/
  source_report/files[{path, sha256, role}], roles inferred by filename
  convention
- PASS-only attestation id: ``fairy:attest:sha256(dataset_id)`` minted only
  when the report has zero FAILs; export *refuses* when not submission-ready
- export bundle: copy report artifacts into a timestamped dir + manifest +
  zip. At 10^12-row scale, input tables are referenced by snapshot id in the
  manifest instead of copied (``role: data`` entries carry the snapshot
  fingerprint as their hash).
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import shutil
import zipfile
from typing import Any

from fairy_core_spark.plans.provenance import attestation_id, fixed_timestamp_or, sha256_file

VALID_ROLES = {"data", "metadata", "report", "log", "other"}


def now_utc_iso_z() -> str:
    return (
        _dt.datetime.now(_dt.timezone.utc).replace(microsecond=0).isoformat().replace("+00:00", "Z")
    )


def infer_role(relpath: str) -> str:
    """filename-convention role inference (manifest.py:15-41)."""
    p = relpath.replace("\\", "/")
    name = p.rsplit("/", 1)[-1].lower()
    if name == "manifest.json":
        return "metadata"
    if name in {"samples.tsv", "files.tsv"}:
        return "metadata"
    if name.endswith(".log"):
        return "log"
    if name.endswith(("_report.json", "_report.md", "report.json", "report.md")):
        return "report"
    if name.endswith((".csv", ".tsv", ".txt", ".fasta", ".fa", ".fastq", ".fq", ".bam", ".cram", ".parquet")):
        return "data"
    return "other"


def build_manifest_v1(
    dataset_id: str,
    engine_version: str,
    source_report: str,
    rulepack_id: str,
    rulepack_version: str,
    files: list[dict[str, Any]],
    created_at_utc: str | None = None,
) -> dict[str, Any]:
    out_files = []
    for f in files:
        ff = dict(f)
        if not ff.get("role"):
            ff["role"] = infer_role(str(ff.get("path", "")))
        if ff["role"] not in VALID_ROLES:
            raise ValueError(f"Unknown role: {ff['role']} (path={ff.get('path')})")
        out_files.append(ff)
    return {
        "schema_version": "1.0.0",
        "dataset_id": dataset_id,
        "created_at_utc": created_at_utc or fixed_timestamp_or(now_utc_iso_z()),
        "fairy_version": engine_version,
        "hash_algorithm": "sha256",
        "rulepack": {"id": rulepack_id, "version": rulepack_version},
        "source_report": source_report,
        "files": out_files,
    }


def attach_attestation(manifest: dict[str, Any], by_level: dict[str, int]) -> dict[str, Any]:
    """PASS-only attestation (export_adapter.py:138-146)."""
    submission_ready = (by_level.get("fail", 0) or 0) == 0
    manifest["submission_ready"] = submission_ready
    if submission_ready:
        manifest["attestation_id"] = attestation_id(manifest["dataset_id"])
    else:
        manifest.pop("attestation_id", None)
    return manifest


class NotSubmissionReady(Exception):
    pass


def export_submission(
    report: dict[str, Any],
    artifact_paths: list[str],
    out_root: str,
    engine_version: str,
    snapshot_refs: dict[str, str] | None = None,
) -> str:
    """Bundle report artifacts + manifest + zip; refuses when the report is
    not submission-ready (export_adapter.py:211-217). ``snapshot_refs``:
    table name -> snapshot id, recorded as role=data entries by reference
    instead of copying payload at scale."""
    by_level = report["summary"]["by_level"]
    if (by_level.get("fail", 0) or 0) != 0:
        raise NotSubmissionReady("export refused: report has FAILs")

    basenames = [os.path.basename(p) for p in artifact_paths]
    dupes = {b for b in basenames if basenames.count(b) > 1}
    if dupes:
        # artifacts land in the bundle by basename; two sources with the
        # same basename would silently overwrite each other and the
        # manifest would attest a hash the bundled file no longer has
        raise ValueError(f"duplicate artifact basenames in export: {sorted(dupes)}")

    stamp = fixed_timestamp_or(now_utc_iso_z()).replace(":", "").replace("-", "")
    bundle_dir = os.path.join(out_root, f"submission_{stamp}")
    # rebuild from scratch: under FAIRY_FIXED_TIMESTAMP (deterministic
    # reports) every export maps to the SAME dir, and reusing a previous
    # export's leftovers would zip files the manifest does not list
    if os.path.exists(bundle_dir):
        shutil.rmtree(bundle_dir)
    os.makedirs(bundle_dir)

    files = []
    for p in artifact_paths:
        dst = os.path.join(bundle_dir, os.path.basename(p))
        shutil.copy(p, dst)
        files.append({"path": os.path.basename(p), "sha256": sha256_file(dst)})
    for name, snap in (snapshot_refs or {}).items():
        files.append({"path": f"{name}.parquet", "sha256": snap, "role": "data"})

    manifest = build_manifest_v1(
        dataset_id=report["dataset_id"],
        engine_version=engine_version,
        source_report="preflight_report.json",
        rulepack_id=report["metadata"]["rulepack"]["id"],
        rulepack_version=report["metadata"]["rulepack"]["version"],
        files=files,
    )
    manifest = attach_attestation(manifest, by_level)
    with open(os.path.join(bundle_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
        f.write("\n")

    zpath = bundle_dir + ".zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _d, fs in os.walk(bundle_dir):
            for fn in sorted(fs):
                full = os.path.join(root, fn)
                z.write(full, os.path.relpath(full, bundle_dir))
    return bundle_dir
