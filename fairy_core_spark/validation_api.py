"""Library validation registry — the reference's third entry point
(core/validation_api.py:43-65): ``register()`` named validators and call
``validate_csv(path, kind)`` to get a ``Meta`` summary with warnings.

Spark-first recast: validators read the CSV with Spark (all-string, header,
deterministic 0-based row ids from file order) and compute warnings as
bounded aggregate/filter plans; only the capped warning list is collected
to the driver (reference caps rna at 200, we collect at most the cap), so
a validator runs unchanged over a 100 TB table.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Protocol


@dataclass
class WarningItem:
    """Mirror of reference validation_api.WarningItem (:16-31)."""

    column: str | None
    kind: str
    message: str
    severity: str  # "error" | "warning"
    row: int | None = None
    hint: str | None = None


@dataclass
class Meta:
    """Mirror of reference validation_api.Meta (:34-39)."""

    n_rows: int
    n_cols: int
    fields_validated: list[str]
    warnings: list[WarningItem] = field(default_factory=list)


class Validator(Protocol):
    name: str
    version: str

    def validate(self, path: str) -> Meta: ...


_VALIDATORS: dict[str, Validator] = {}


def register(name: str, validator: Validator) -> None:
    _VALIDATORS[name] = validator


def get_validator(kind: str) -> Validator | None:
    return _VALIDATORS.get(kind)


def validate_csv(path: str, kind: str = "rna") -> Meta:
    """kind falls back to 'generic' when unregistered
    (reference validation_api.py:59-64)."""
    v = _VALIDATORS.get(kind) or _VALIDATORS.get("generic")
    if v is None:
        raise RuntimeError(f"No validator registered for kind='{kind}' or 'generic'")
    return v.validate(path)


@dataclass
class Finding:
    """Richer finding type (reference validation_api.py:70-78)."""

    code: str
    severity: str  # "FAIL" | "WARN"
    where: str
    why: str
    how_to_fix: str
    details: dict[str, Any]


# registering the built-ins is a side effect of importing the module,
# mirroring the reference's import-time register() calls
from fairy_core_spark import validators as _builtin_validators  # noqa: E402,F401
