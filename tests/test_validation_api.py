"""Library validation registry parity (reference core/validation_api.py:43-65,
validators/rna.py:13-39, validators/generic.py:11-29): register/lookup,
validate_csv fallback-to-generic, RNA Meta contract (n_rows/n_cols/
fields_validated/warnings with the 200 cap semantics), row indices 0-based."""

from __future__ import annotations

import pytest

from fairy_core_spark import validation_api as vapi

FIX = "tests/fixtures"


@pytest.fixture(autouse=True)
def _need_spark(spark):
    # validators pick up the active session started by the shared fixture
    yield


def test_registry_lookup_and_fallback():
    assert vapi.get_validator("rna") is not None
    assert vapi.get_validator("generic") is not None
    assert vapi.get_validator("nope") is None
    # unknown kind falls back to generic (validation_api.py:59-64)
    meta = vapi.validate_csv(f"{FIX}/rna_samples.csv", kind="unknown-kind")
    assert meta.n_rows == 5 and meta.warnings == []


def test_rna_meta_contract():
    meta = vapi.validate_csv(f"{FIX}/rna_samples.csv", kind="rna")
    assert meta.n_rows == 5
    assert meta.n_cols == 5
    # fields_validated = sorted(present & (REQUIRED+OPTIONAL)) — 'notes' excluded
    assert meta.fields_validated == ["collection_date", "read_length", "sample_id", "tissue"]
    errors = [w for w in meta.warnings if w.severity == "error"]
    warns = [w for w in meta.warnings if w.severity == "warning"]
    # row 1 (0-based) has blank sample_id
    assert [(w.kind, w.row) for w in errors] == [("missing_value", 1)]
    # rows 2 (non-numeric), 3 (zero), 4 (blank) fail read_length >= 1
    assert [(w.kind, w.row) for w in warns] == [
        ("invalid_read_length", 2),
        ("invalid_read_length", 3),
        ("invalid_read_length", 4),
    ]


def test_rna_missing_required_column():
    meta = vapi.validate_csv(f"{FIX}/rna_missing_col.csv", kind="rna")
    assert meta.n_rows == 2 and meta.n_cols == 2
    assert meta.fields_validated == ["read_length"]
    assert [(w.kind, w.severity, w.row) for w in meta.warnings[:1]] == [
        ("missing_column", "error", None)
    ]


def test_generic_shape_only():
    meta = vapi.validate_csv(f"{FIX}/rna_samples.csv", kind="generic")
    assert meta.n_rows == 5 and meta.n_cols == 5
    # generic keeps header order, not sorted (generic.py:19-26)
    assert meta.fields_validated[0] == "sample_id"
    assert meta.warnings == []


def test_custom_validator_registration():
    class Stub:
        name = "stub"
        version = "0"

        def validate(self, path: str) -> vapi.Meta:
            return vapi.Meta(n_rows=0, n_cols=0, fields_validated=[], warnings=[])

    vapi.register("stub", Stub())
    try:
        assert vapi.validate_csv(f"{FIX}/rna_samples.csv", kind="stub").n_rows == 0
    finally:
        vapi._VALIDATORS.pop("stub", None)


def test_process_csv_shim(spark):
    """Legacy shim parity (reference validation/process_csv.py:23-36):
    (meta, df) with filename/sha256/n_rows/n_cols/fields/warnings."""
    from fairy_core_spark.process_csv import process_csv

    meta, df = process_csv(f"{FIX}/rna_samples.csv")
    assert meta["filename"] == "rna_samples.csv"
    assert len(meta["sha256"]) == 64
    assert meta["n_rows"] == 5 and meta["n_cols"] == 5
    assert meta["fields_validated"] == ["collection_date", "read_length", "sample_id", "tissue"]
    assert len(meta["warnings"]) == 4 and all(isinstance(w, dict) for w in meta["warnings"])
    assert df.count() == 5 and "sample_id" in df.columns
