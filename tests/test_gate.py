"""Change-aware gate ordering (fairy_core_spark/gate.py).

The driver certifies registry entries under a budget that has historically
stopped at 50 of 66 — ordering decides which entries get fresh official
rows. These tests pin the three invariants that make a budget cut safe:

1. fingerprints are per-entry granular: an edit to one operator module flips
   exactly the entries that (transitively) reach it — not the whole registry;
2. changed entries serve before starved entries serve before green ones;
3. ordering failures degrade to plain registration order, never an error.
"""

from __future__ import annotations

import json

import pytest

from fairy_core_spark import gate
from fairy_core_spark.queries import _ORACLES, _QUERIES, oracle_sql, queries


@pytest.fixture(scope="module")
def fps():
    return gate.entry_fingerprints(_QUERIES, _ORACLES)


def test_every_entry_has_a_fingerprint(fps):
    assert set(fps) == set(_QUERIES)
    assert all(len(v) == 64 for v in fps.values())


def test_fingerprints_are_deterministic(fps):
    again = gate.entry_fingerprints(_QUERIES, _ORACLES)
    assert again == fps


def test_module_edit_flips_only_reaching_entries(tmp_path, fps, monkeypatch):
    """Simulate an edit to operators/sampling.py via the sources hook: only
    the sampling-dependent entries flip; rule/spatial/image entries do not."""
    real = gate._package_sources

    def patched():
        out = real()
        mod = "fairy_core_spark.operators.sampling"
        path, src = out[mod]
        out[mod] = (path, src + "\n# simulated edit\n")
        return out

    monkeypatch.setattr(gate, "_package_sources", patched)
    cur = gate.entry_fingerprints(_QUERIES, _ORACLES)
    flipped = {n for n in cur if cur[n] != fps[n]}
    assert {"sample_split_documents", "sample_stratified_documents",
            "sample_quota_per_source", "sample_quota_sqrt",
            "sample_quota_registered_domain", "sample_split_leakage_safe"} <= flipped
    assert "rule_required_nullish" not in flipped
    assert "q1_pricing_summary" not in flipped
    assert "spatial_zorder_encode" not in flipped


def test_fn_source_participates(fps):
    """The entry's own source text is part of the hash (registry-module
    edits outside a fn don't flip it, but the fn body does)."""
    texts, _seeds = gate._entry_parts(_QUERIES["q1_pricing_summary"], gate._package_sources())
    assert any("q1" in t or "pricing" in t for t in texts)


def test_serve_order_tiers(monkeypatch, fps):
    names = list(_QUERIES)
    # pretend: one entry changed, one starved, rest green
    snap = dict(fps)
    snap[names[5]] = "0" * 64  # changed
    monkeypatch.setattr(gate, "_load_snapshot", lambda: snap)
    monkeypatch.setattr(gate, "_last_certified", lambda: set(names) - {names[9]})
    order = gate.serve_order(_QUERIES, _ORACLES)
    assert order[0] == names[5]
    assert order[1] == names[9]
    assert set(order) == set(names) and len(order) == len(names)


def test_serve_order_t0_never_certified_first(monkeypatch, fps):
    """Within the changed tier, entries that never carried an official row
    in ANY round file outrank changed-but-previously-green entries — so a
    budget cut into T0 lands on an entry with a prior green row, never on a
    brand-new one. Registration order is kept within each sub-tier."""
    names = list(_QUERIES)
    snap = dict(fps)
    for n in (names[2], names[5], names[7]):
        snap[n] = "0" * 64  # all three changed
    monkeypatch.setattr(gate, "_load_snapshot", lambda: snap)
    monkeypatch.setattr(gate, "_last_certified", lambda: set(names))
    # names[5] has never been certified in any round; the other two have
    monkeypatch.setattr(gate, "_ever_certified", lambda: set(names) - {names[5]})
    order = gate.serve_order(_QUERIES, _ORACLES)
    assert order[:3] == [names[5], names[2], names[7]]
    assert set(order) == set(names) and len(order) == len(names)


def test_serve_order_never_certified_cheapest_first(monkeypatch, fps):
    """Within the never-certified block, entries sort by measured cost from
    the committed full-certification artifact (cheapest first), so a
    time-budgeted walker certifies the most brand-new entries; missing
    costs fall back to registration order (stable sort, cost inf)."""
    names = list(_QUERIES)
    snap = dict(fps)
    fresh = [names[2], names[5], names[7], names[9]]
    for n in fresh:
        snap[n] = "0" * 64
    monkeypatch.setattr(gate, "_load_snapshot", lambda: snap)
    monkeypatch.setattr(gate, "_last_certified", lambda: set(names))
    monkeypatch.setattr(gate, "_ever_certified", lambda: set(names) - set(fresh))
    monkeypatch.setattr(
        gate,
        "_certified_costs",
        lambda: {names[2]: 9.0, names[5]: 0.5, names[7]: 3.0},  # names[9] missing
    )
    order = gate.serve_order(_QUERIES, _ORACLES)
    assert order[:4] == [names[5], names[7], names[2], names[9]]


def test_certified_costs_parses_committed_artifact():
    costs = gate._certified_costs()
    # the round-5 artifact is committed; every registry entry has a cost
    assert costs and all(v >= 0 for v in costs.values())


def test_serve_order_degrades_to_registration_order(monkeypatch):
    monkeypatch.setattr(gate, "_load_snapshot", lambda: None)
    monkeypatch.setattr(gate, "_last_certified", lambda: None)
    assert gate.serve_order(_QUERIES, _ORACLES) == list(_QUERIES)


def test_snapshot_file_matches_current_tree(fps):
    """The committed snapshot must equal the tree's fingerprints at commit
    time of the LAST certified round; entries added/changed this round are
    allowed to diverge (that is the mechanism) but the file must parse and
    cover a sane majority of the registry."""
    with open(gate.SNAPSHOT_PATH) as fh:
        data = json.load(fh)
    snap = data["fingerprints"]
    assert len(snap) >= 50
    # every snapshot key must name a live registry entry (entries are never
    # removed mid-round); a stale/renamed snapshot would silently disable
    # change-aware ordering by making everything read as "changed"
    assert set(snap) <= set(_QUERIES)


def test_registry_dicts_complete_and_aligned():
    qs, os_ = queries(), oracle_sql()
    assert set(qs) == set(_QUERIES)
    assert set(os_) == set(_ORACLES)
    assert set(os_) <= set(qs)


def test_fingerprints_ignore_runtime_cache_state():
    """mutable module globals (queries._MEMO and friends) must not leak
    into fingerprints — a populated cache would flip every memo-backed
    entry to 'changed' and hijack the budget window."""
    from fairy_core_spark import gate, queries as Q

    before = gate.entry_fingerprints(Q._QUERIES, Q._ORACLES)
    Q._MEMO[("app-123", "sentinel")] = object()
    try:
        after = gate.entry_fingerprints(Q._QUERIES, Q._ORACLES)
    finally:
        Q._MEMO.pop(("app-123", "sentinel"), None)
    assert before == after
