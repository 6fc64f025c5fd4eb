"""Profiles-as-workflow-composition (reference ADR-0007,
core/services/preflight_profiles.py:26-51,117-162): a registry mapping
profile id -> runner function, so the CLI composes rulepack + input naming
+ output layout without hardcoding one preflight path.

Profiles are driver-side orchestration only — each runner delegates to the
distributed preflight engine (plans/preflight_report.run_preflight), so
registry dispatch adds zero cost to the Spark plan.

Built-ins mirror the reference registry:
- ``geo``: GEO-style samples/files TSV preflight.
- ``spellbook``: validate-style preflight for exactly 2 inputs
  (input_01 -> samples table, input_02 -> files table).
- ``generic``: alias of spellbook.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from typing import Any

RunnerFn = Callable[..., dict[str, Any]]


@dataclass(frozen=True)
class PreflightProfile:
    id: str
    description: str
    runner: RunnerFn


class ProfileNotFoundError(ValueError):
    pass


class ProfilesRegistry:
    """Duplicate registration is an error; lookups raise
    ProfileNotFoundError (reference preflight_profiles.py:27-51)."""

    def __init__(self) -> None:
        self._profiles: dict[str, PreflightProfile] = {}

    def register(self, profile: PreflightProfile) -> None:
        if profile.id in self._profiles:
            raise ValueError(f"Duplicate profile id: {profile.id}")
        self._profiles[profile.id] = profile

    def get(self, profile_id: str) -> PreflightProfile:
        try:
            return self._profiles[profile_id]
        except KeyError as e:
            raise ProfileNotFoundError(f"Unknown profile: {profile_id}") from e

    def list(self) -> list[dict[str, str]]:
        return [
            {"id": p.id, "description": p.description}
            for p in sorted(self._profiles.values(), key=lambda x: x.id)
        ]

    def list_profile_ids(self) -> list[str]:
        return sorted(self._profiles.keys())


def _run_geo(
    *,
    spark,
    rulepack: dict[str, Any],
    rulepack_path: str,
    inputs: dict[str, Any],
    params: dict[str, Any] | None,
) -> dict[str, Any]:
    from fairy_core_spark.plans.preflight_report import run_preflight

    samples = inputs.get("samples")
    files = inputs.get("files")
    if not samples or not files:
        raise ValueError("geo profile requires inputs['samples'] and inputs['files']")
    return run_preflight(
        spark, rulepack, rulepack_path, samples, files, params=params or {}
    )


def _run_generic(
    *,
    spark,
    rulepack: dict[str, Any],
    rulepack_path: str,
    inputs: dict[str, Any],
    params: dict[str, Any] | None,
) -> dict[str, Any]:
    """2-input validate-style preflight: input_01 -> samples table,
    input_02 -> files table (reference preflight_profiles.py:79-105)."""
    from fairy_core_spark.plans.preflight_report import run_preflight

    a = inputs.get("input_01") or inputs.get("samples")
    b = inputs.get("input_02") or inputs.get("files")
    if not a or not b:
        raise ValueError(
            "spellbook/generic requires inputs {'input_01': A, 'input_02': B}"
        )
    return run_preflight(spark, rulepack, rulepack_path, a, b, params=params or {})


_REGISTRY: ProfilesRegistry | None = None


def get_registry() -> ProfilesRegistry:
    global _REGISTRY
    if _REGISTRY is None:
        reg = ProfilesRegistry()
        reg.register(
            PreflightProfile(
                id="geo",
                description="GEO-style samples/files TSV preflight",
                runner=_run_geo,
            )
        )
        reg.register(
            PreflightProfile(
                id="spellbook",
                description="Validate-style preflight for exactly 2 inputs",
                runner=_run_generic,
            )
        )
        reg.register(
            PreflightProfile(
                id="generic",
                description="Alias of spellbook (2-input validate-style preflight)",
                runner=_run_generic,
            )
        )
        _REGISTRY = reg
    return _REGISTRY


def run_profile(
    profile_id: str,
    *,
    spark,
    rulepack: dict[str, Any],
    rulepack_path: str,
    inputs: dict[str, Any],
    params: dict[str, Any] | None = None,
) -> dict[str, Any]:
    profile = get_registry().get(profile_id)
    return profile.runner(
        spark=spark,
        rulepack=rulepack,
        rulepack_path=rulepack_path,
        inputs=inputs,
        params=params or {},
    )
