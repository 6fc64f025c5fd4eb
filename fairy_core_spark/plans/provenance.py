"""Content-addressed identity for validated datasets.

Re-implements the reference's provenance semantics for a distributed engine:

- canonical JSON (reference ``src/fairy/core/services/provenance.py:28-30``):
  ``sort_keys=True, separators=(",", ":")``.
- params fingerprint (``provenance.py:33-36``): sha256 of canonical params.
- dataset fingerprint (``provenance.py:131-159`` + ADR-0006): versioned
  canonical payload of {inputs' sha256, rulepack id/version/sha256, params
  sha256, canon_version}; row/col counts deliberately excluded so the id is
  stable across cosmetic re-serialization.

At cluster scale we never re-hash 10^12 rows: a table's identity is its
snapshot id (Iceberg) / the sha256 of its sorted per-file (path, size,
mtime-less content hash) manifest (parquet-dir table layer). Whole-file
sha256 streaming stays for small driver-side sidecar files only.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any

CANON_VERSION = 1


def canonical_json(obj: Any) -> str:
    """Stable serialization: sorted keys, no whitespace."""
    return json.dumps(obj, sort_keys=True, separators=(",", ":"))


def sha256_hex(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def sha256_file(path: str, chunk: int = 65536) -> str:
    """Streamed file hash (64 KiB chunks, as the reference's attestation
    scan does, ``rulepack_runner.py:73-78``). Driver-side, small files only."""
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def compute_params_sha256(params: dict | None) -> str:
    return sha256_hex(canonical_json(params or {}).encode("utf-8"))


def compute_dataset_id(
    inputs_sha256: dict[str, str],
    rulepack_id: str,
    rulepack_version: str,
    rulepack_sha256: str,
    params_sha256: str,
) -> str:
    """``"sha256:" + sha256(canonical payload)`` — same shape as the
    reference (``provenance.py:131-159``)."""
    payload = {
        "canon_version": CANON_VERSION,
        "inputs": {name: {"sha256": h} for name, h in sorted(inputs_sha256.items())},
        "params": {"sha256": params_sha256},
        "rulepack": {
            "id": rulepack_id,
            "sha256": rulepack_sha256,
            "version": rulepack_version,
        },
    }
    return "sha256:" + sha256_hex(canonical_json(payload).encode("utf-8"))


def attestation_id(dataset_id: str) -> str:
    """PASS-only attestation id, minted by callers only when fail == 0
    (reference ``export_adapter.py:31-34,140-146``)."""
    return "fairy:attest:" + sha256_hex(dataset_id.encode("utf-8"))


def table_fingerprint(path: str) -> str:
    """Identity of a parquet-directory table: sha256 over the sorted
    (relpath, size, content-sha256) manifest of its data files.

    This is the parquet-dir stand-in for an Iceberg snapshot id. For tables
    too large to re-hash, production swaps in the snapshot id via the table
    layer; the fingerprint *contract* (stable string per immutable snapshot)
    is identical.
    """
    entries = []
    if os.path.isfile(path):
        return sha256_file(path)
    for root, _dirs, files in os.walk(path):
        for fn in sorted(files):
            if fn.startswith(("_", ".")):
                continue
            fp = os.path.join(root, fn)
            rel = os.path.relpath(fp, path)
            entries.append((rel, os.path.getsize(fp), sha256_file(fp)))
    entries.sort()
    return sha256_hex(canonical_json(entries).encode("utf-8"))


def fixed_timestamp_or(now_iso: str) -> str:
    """Deterministic-report hook: the reference honors FAIRY_FIXED_TIMESTAMP
    for golden tests (``core/validation_api.py:98-102``); we keep the same
    env contract."""
    return os.environ.get("FAIRY_FIXED_TIMESTAMP", now_iso)
