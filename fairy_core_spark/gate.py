"""Change-aware ordering for the driver-contract query registry.

The external driver certifies registry entries against their DuckDB oracles
under a time/entry budget (it has historically stopped at 50 of 66). Round 4
exposed the failure mode of any *static* ordering: shared dedup code changed
while every dedup gate entry sat outside the evaluated window, so the round
shipped changed code whose gate entries carried no fresh official row.

This module makes the ordering *change-aware* so that, by construction,
every entry whose implementation changed since the last certified round is
served inside the budget window:

1. ``entry_fingerprints(queries, oracles)`` computes, per entry, a sha256
   over (a) the query function's own source, (b) its oracle SQL, and (c) the
   file contents of every ``fairy_core_spark`` module transitively reachable
   from the modules the function references (resolved from its globals and
   its function-local imports, then closed over the package import graph).
   Any edit to any reachable module flips the fingerprint.
2. A snapshot of those fingerprints as of the *last certified round* lives
   in ``fairy_core_spark/goldens/gate_fingerprints.json`` (regenerate with
   ``scripts/gen_gate_fingerprints.py`` at the START of a round, before
   changing code, so the snapshot reflects the tree the previous round's
   gate actually certified).
3. ``serve_order(names)`` partitions the registry into three tiers, each
   keeping registration order:
     T0  fingerprint differs from the snapshot (or entry is new) — changed
         code MUST be re-certified;
     T1  entry missing from the newest ``CORRECTNESS_r*.json`` in the repo
         root — starved last round, certify before anything already green;
     T2  everything else — green last round AND byte-identical dependencies.
   An entry the budget cuts from T2 is therefore one whose current bytes
   already have a green official row, which is the only safe thing to cut.

Everything here is best-effort: any failure (missing snapshot, unreadable
source, odd packaging) degrades to the static round-4 ordering rather than
breaking the registry.
"""

from __future__ import annotations

import ast
import hashlib
import json
import re
from pathlib import Path

_PKG = "fairy_core_spark"
_PKG_ROOT = Path(__file__).resolve().parent
_REPO_ROOT = _PKG_ROOT.parent
SNAPSHOT_PATH = _PKG_ROOT / "goldens" / "gate_fingerprints.json"

# goldens are frozen oracle data with their own drift tests; including the
# 7.5k-line generated file would make every fingerprint flip on any golden
# regen even when the entry's machinery is untouched. Entries whose oracle
# VALUES come from goldens still flip via (b): the oracle SQL embeds them.
_EXCLUDE = {"goldens/contract_goldens.py"}


def _module_name(path: Path) -> str:
    rel = path.relative_to(_PKG_ROOT).with_suffix("")
    parts = (_PKG, *rel.parts)
    if parts[-1] == "__init__":
        parts = parts[:-1]
    return ".".join(parts)


def _package_sources() -> dict[str, tuple[Path, str]]:
    out: dict[str, tuple[Path, str]] = {}
    for p in sorted(_PKG_ROOT.rglob("*.py")):
        rel = str(p.relative_to(_PKG_ROOT))
        if rel in _EXCLUDE:
            continue
        try:
            out[_module_name(p)] = (p, p.read_text())
        except OSError:
            continue
    return out


def _imports_of(src: str, this_mod: str, is_pkg: bool = False) -> set[str]:
    """Package-internal module names imported anywhere in ``src``
    (top-level and function-local, absolute and relative). ``is_pkg``:
    ``src`` is a package ``__init__`` — level-1 relative imports then
    resolve against the package itself, not its parent (``from . import x``
    in ``a/b/__init__.py`` means ``a.b.x``, not ``a.x``)."""
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return set()
    found: set[str] = set()
    pkg_parts = this_mod.split(".")
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name == _PKG or a.name.startswith(_PKG + "."):
                    found.add(a.name)
        elif isinstance(node, ast.ImportFrom):
            if node.level:  # relative: resolve against this module's package
                drop = node.level - 1 if is_pkg else node.level
                base = pkg_parts[: len(pkg_parts) - drop]
                mod = ".".join(base + ([node.module] if node.module else []))
            else:
                mod = node.module or ""
            if mod == _PKG or mod.startswith(_PKG + "."):
                found.add(mod)
                # `from pkg.mod import name` may name a submodule
                for a in node.names:
                    found.add(f"{mod}.{a.name}")
    return found


def _closure(seeds: set[str], graph: dict[str, set[str]]) -> set[str]:
    seen: set[str] = set()
    stack = [s for s in seeds if s in graph]
    while stack:
        m = stack.pop()
        if m in seen:
            continue
        seen.add(m)
        stack.extend(d for d in graph.get(m, ()) if d not in seen)
    return seen


def _co_names(code) -> set[str]:
    names: set[str] = set()
    stack = [code]
    while stack:
        c = stack.pop()
        names.update(c.co_names)
        names.update(c.co_freevars)
        stack.extend(k for k in c.co_consts if hasattr(k, "co_names"))
    return names


def _entry_parts(fn, sources: dict[str, tuple[Path, str]]) -> tuple[list[str], set[str]]:
    """(per-entry source texts, package module seeds) for one entry.

    The entry functions all live in one registry module (queries.py) that
    changes every round, so hashing that whole file would flip EVERY
    fingerprint on ANY registry edit. Instead we hash per-object: the entry
    fn's own source, plus — recursively — the source/repr of registry-module
    globals it references (helper fns, frozen constants). Globals defined in
    OTHER package modules contribute their whole module (closed over the
    package import graph) since an edit anywhere in an operator module can
    change behavior reached through it.
    """
    import inspect

    entry_mod = fn.__module__
    texts: list[str] = []
    seeds: set[str] = set()
    seen: set[int] = set()

    def visit(obj) -> None:
        if id(obj) in seen:
            return
        seen.add(id(obj))
        code = getattr(obj, "__code__", None)
        if code is None:
            return
        try:
            src = inspect.getsource(obj)
        except (OSError, TypeError):
            # repr(fn) embeds a memory address (new every process) — a
            # stable sentinel keeps fingerprints deterministic when source
            # is unavailable (pyc-only / zipped installs)
            src = (
                f"<nosource:{getattr(obj, '__module__', '?')}."
                f"{getattr(obj, '__qualname__', '?')}>"
            )
        texts.append(src)
        seeds.update(m for m in _imports_of(src, entry_mod) if m in sources)
        for m in re.findall(rf"{_PKG}(?:\.\w+)+", src):
            if m in sources:
                seeds.add(m)
        g = getattr(obj, "__globals__", {})
        for n in sorted(_co_names(code)):
            val = g.get(n)
            if val is None:
                continue
            mod = getattr(val, "__module__", None)
            if type(val).__name__ == "module":
                name = getattr(val, "__name__", "")
                if name in sources:
                    seeds.add(name)
            elif isinstance(mod, str) and (mod == _PKG or mod.startswith(_PKG + ".")):
                if mod == entry_mod:
                    visit(val)  # registry-local helper: hash per-object
                elif mod in sources:
                    seeds.add(mod)
            elif not callable(val) and isinstance(val, (str, bytes, int, float, tuple)):
                # module-level IMMUTABLE constant — hash its value, wherever
                # it was defined. Mutable containers (list/dict/set) are
                # deliberately NOT hashed: runtime caches like queries._MEMO
                # mutate between calls (making fingerprints state-dependent)
                # and set/frozenset reprs reorder under PYTHONHASHSEED.
                # Frozen golden lists still flip fingerprints through (b):
                # every oracle embeds their values in its SQL text.
                texts.append(f"{n}={val!r}")
    visit(fn)
    return texts, seeds


def entry_fingerprints(queries: dict, oracles: dict) -> dict[str, str]:
    """name -> sha256 fingerprint of the entry's full implementation."""
    sources = _package_sources()
    graph = {
        m: _imports_of(src, m, is_pkg=(p.name == "__init__.py")) & sources.keys()
        for m, (p, src) in sources.items()
    }
    file_hash = {
        m: hashlib.sha256(src.encode()).hexdigest() for m, (_, src) in sources.items()
    }
    fps: dict[str, str] = {}
    for name, fn in queries.items():
        h = hashlib.sha256()
        texts, seeds = _entry_parts(fn, sources)
        for t in texts:
            h.update(b"\x00" + t.encode())
        h.update(b"\x00" + (oracles.get(name) or "").encode())
        for m in sorted(_closure(seeds, graph)):
            h.update(f"\x00{m}\x00{file_hash[m]}".encode())
        fps[name] = h.hexdigest()
    return fps


def _load_snapshot() -> dict[str, str] | None:
    try:
        with open(SNAPSHOT_PATH) as fh:
            data = json.load(fh)
        return data.get("fingerprints") if isinstance(data, dict) else None
    except (OSError, ValueError):
        return None


def _last_certified() -> set[str] | None:
    """Entry names in the newest CORRECTNESS_r*.json next to the package."""
    best: tuple[int, Path] | None = None
    try:
        for p in _REPO_ROOT.glob("CORRECTNESS_r*.json"):
            m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name)
            if m and (best is None or int(m.group(1)) > best[0]):
                best = (int(m.group(1)), p)
        if best is None:
            return None
        with open(best[1]) as fh:
            return set(json.load(fh).keys())
    except (OSError, ValueError):
        return None


def _ever_certified() -> set[str] | None:
    """Entry names appearing in ANY CORRECTNESS_r*.json in the repo root."""
    found = False
    names: set[str] = set()
    try:
        for p in _REPO_ROOT.glob("CORRECTNESS_r*.json"):
            if not re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name):
                continue
            with open(p) as fh:
                names.update(json.load(fh).keys())
            found = True
        return names if found else None
    except (OSError, ValueError):
        return None


def serve_order(queries: dict, oracles: dict) -> list[str]:
    """Registry names ordered change-first / starved-second / green-last.

    Tier assignment is logged nowhere and changes nothing about any entry's
    behavior — this is pure ordering for an external budget-limited walker.
    """
    names = list(queries)
    snapshot = _load_snapshot()
    certified = _last_certified()
    if snapshot is None and certified is None:
        return names
    try:
        current = entry_fingerprints(queries, oracles) if snapshot is not None else {}
    except Exception:
        current = {}
    changed = {
        n for n in names if snapshot is not None and current.get(n) != snapshot.get(n)
    } if current else set()
    starved = {n for n in names if certified is not None and n not in certified}
    t0 = [n for n in names if n in changed]
    t1 = [n for n in names if n not in changed and n in starved]
    t2 = [n for n in names if n not in changed and n not in starved]
    # Within T0, entries that have NEVER carried an official row (new this
    # round) outrank changed-but-previously-green entries: if the budget
    # cuts into T0 at all, the cut then lands on an entry that at least has
    # a prior green row on near-identical bytes, never on a brand-new one.
    # Within the never-certified block, CHEAPEST-measured-first (cost from
    # the committed full-certification artifact): if the external budget
    # has a time component this strictly maximizes how many brand-new
    # entries get an official row; under a pure entry cap it is neutral.
    ever = _ever_certified()
    if ever is not None:
        cost = _certified_costs()
        t0.sort(
            key=lambda n: (n in ever, cost.get(n, float("inf")) if n not in ever else 0.0)
        )  # stable: registration order breaks cost ties / missing costs
    return t0 + t1 + t2


def _certified_costs() -> dict[str, float]:
    """Per-entry wall seconds parsed from the newest committed
    BENCH/ORACLES_r*_full.md self-certification artifact (empty dict if
    absent/unparsable — ordering falls back to registration order)."""
    best: tuple[int, Path] | None = None
    try:
        for p in (_REPO_ROOT / "BENCH").glob("ORACLES_r*_full.md"):
            m = re.fullmatch(r"ORACLES_r(\d+)_full\.md", p.name)
            if m and (best is None or int(m.group(1)) > best[0]):
                best = (int(m.group(1)), p)
        if best is None:
            return {}
        text = best[1].read_text()
        return {
            m.group(1): float(m.group(2))
            for m in re.finditer(r"OK\s+(\w+): \d+ rows\s+\(([\d.]+)s\)", text)
        }
    except (OSError, ValueError):
        return {}
