"""Tiny display-formatting helpers for report surfaces (parity with the
reference's ``utils/ui.py:1-29``: status chips, human-readable byte sizes,
table shape badges). Pure driver-side string shaping — used by the CLI and
report emitters when summarizing a table or project row; nothing here
touches a DataFrame.

Output semantics match the reference exactly (unknown statuses fall back
to the pending chip; byte sizes render one decimal with no space before
the unit; unknown dimensions render as ``?``).
"""

from __future__ import annotations

# reference utils/ui.py:7 — the four project/table statuses and their chips
STATUS_EMOJI = {"pending": "⏳", "valid": "\U0001f7e2", "warn": "\U0001f7e1", "fail": "\U0001f534"}

_PENDING = STATUS_EMOJI["pending"]
_UNITS = ("B", "KB", "MB", "GB", "TB")


def status_chip(status: str | None) -> str:
    """``"<emoji> <status>"`` for a (case-insensitive) status string; None
    and unrecognized values render with the pending chip (utils/ui.py:10-12)."""
    s = (status or "pending").lower()
    return f"{STATUS_EMOJI.get(s, _PENDING)} {s}"


def format_bytes(n: int | None) -> str:
    """Human-readable size, 1024-based, one decimal, capped at TB; zero,
    None, and negatives all render ``"-"`` (utils/ui.py:15-23)."""
    if not n or n < 0:
        return "-"
    size = float(n)
    unit = 0
    while size >= 1024.0 and unit + 1 < len(_UNITS):
        size /= 1024.0
        unit += 1
    return f"{size:.1f}{_UNITS[unit]}"


def shape_badge(rows: int | None, cols: int | None) -> str:
    """``"rows×cols"`` with ``?`` for unknown dimensions (utils/ui.py:26-29)."""
    r = "?" if rows is None else rows
    c = "?" if cols is None else cols
    return f"{r}×{c}"
