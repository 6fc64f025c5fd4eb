"""Rulepack loading & normalization.

Rulepacks are *data*, the engine is *code* (reference ADR-0002,
``decisions/0002-rulepacks-vs-runner-separation.md:20-36``). Two on-disk
schemas exist in the reference and both are accepted here:

- old: ``meta{name,version} + rules[]{id,type,severity,config{pattern,...}}``
  (``src/fairy/validation/rulepack_runner.py:45-70``)
- new: ``id/version + resources[]{pattern, rules[]}``
  (``src/fairy/rulepack/schema.py:23-29``, ``rulepack_runner.py:123-124``)

Both normalize to a flat list of Rule records with an fnmatch pattern
matched against the *input name* (reference matches the filename,
``rulepack_runner.py:173-182``); the distributed engine matches against the
registered table/input name plus its source filename when known.
"""

from __future__ import annotations

import fnmatch
import json
from dataclasses import dataclass, field
from typing import Any

try:
    import yaml  # noqa: F401

    _HAVE_YAML = True
except Exception:  # pragma: no cover - pyyaml ships with pyspark images
    _HAVE_YAML = False

from fairy_core_spark.plans.provenance import canonical_json, sha256_hex

SEVERITIES = ("fail", "warn")


@dataclass(frozen=True)
class Rule:
    id: str
    type: str
    severity: str  # fail | warn
    config: dict[str, Any] = field(default_factory=dict)
    pattern: str = "*"

    def matches(self, input_name: str, filename: str | None = None) -> bool:
        """fnmatch against the input name; the reference matches the
        file's basename (``rulepack_runner.py:173-182``), so a registered
        source filename is also tried when provided."""
        if fnmatch.fnmatch(input_name, self.pattern):
            return True
        if filename is not None and fnmatch.fnmatch(filename, self.pattern):
            return True
        # convenience: "artists.csv" patterns also match input name "artists"
        stem = self.pattern.rsplit(".", 1)[0] if "." in self.pattern else self.pattern
        return fnmatch.fnmatch(input_name, stem)


@dataclass(frozen=True)
class Rulepack:
    id: str
    version: str
    rules: tuple[Rule, ...]
    sha256: str  # content hash of the raw rulepack document
    raw: dict[str, Any] = field(default_factory=dict, compare=False)

    def rules_for(self, input_name: str, filename: str | None = None) -> list[Rule]:
        """Rules matching one input, sorted by rule id — execution order is
        part of the reference's deterministic-report contract
        (``rulepack_runner.py:187``)."""
        return sorted(
            (r for r in self.rules if r.matches(input_name, filename)),
            key=lambda r: r.id,
        )


def _norm_rule(raw: dict[str, Any], pattern_override: str | None = None) -> Rule:
    rid = str(raw.get("id", ""))
    rtype = str(raw.get("type", ""))
    severity = str(raw.get("severity", "fail")).lower()
    if severity not in SEVERITIES:
        severity = "fail"
    config = dict(raw.get("config", {}) or {})
    pattern = pattern_override or str(config.get("pattern", "*") or "*")
    return Rule(id=rid, type=rtype, severity=severity, config=config, pattern=pattern)


def rulepack_from_dict(doc: dict[str, Any], raw_bytes: bytes | None = None) -> Rulepack:
    sha = sha256_hex(raw_bytes if raw_bytes is not None else canonical_json(doc).encode())
    rules: list[Rule] = []
    if "resources" in doc:  # new schema
        rp_id = str(doc.get("id", "rulepack"))
        version = str(doc.get("version", "0"))
        for res in doc.get("resources", []) or []:
            pattern = str(res.get("pattern", "*") or "*")
            for r in res.get("rules", []) or []:
                rules.append(_norm_rule(r, pattern_override=pattern))
    else:  # old schema
        meta = doc.get("meta", {}) or {}
        rp_id = str(meta.get("name", doc.get("id", "rulepack")))
        version = str(meta.get("version", doc.get("version", "0")))
        for r in doc.get("rules", []) or []:
            rules.append(_norm_rule(r))
    return Rulepack(id=rp_id, version=version, rules=tuple(rules), sha256=sha, raw=doc)


def load_rulepack(path: str) -> Rulepack:
    """Load YAML or JSON rulepack from disk (reference accepts both,
    ``cli/validate.py:82-85``)."""
    with open(path, "rb") as f:
        raw = f.read()
    text = raw.decode("utf-8")
    if path.endswith(".json"):
        doc = json.loads(text)
    else:
        if not _HAVE_YAML:
            raise RuntimeError("pyyaml unavailable; use a JSON rulepack")
        import yaml

        doc = yaml.safe_load(text)
    if not isinstance(doc, dict):
        raise ValueError(f"rulepack {path} did not parse to a mapping")
    return rulepack_from_dict(doc, raw_bytes=raw)
