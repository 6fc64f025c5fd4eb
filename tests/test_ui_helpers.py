"""Parity tests for the display-formatting helpers (reference
``utils/ui.py:1-29``): chip fallback behaviour, 1024-based size units,
and the shape badge's unknown-dimension rendering."""

from fairy_core_spark.plans.ui import format_bytes, shape_badge, status_chip


def test_status_chip_known_statuses():
    assert status_chip("valid") == "\U0001f7e2 valid"
    assert status_chip("warn") == "\U0001f7e1 warn"
    assert status_chip("fail") == "\U0001f534 fail"
    assert status_chip("pending") == "⏳ pending"


def test_status_chip_fallbacks():
    # None and unknown values both get the pending chip; case-folded
    assert status_chip(None) == "⏳ pending"
    assert status_chip("VALID") == "\U0001f7e2 valid"
    assert status_chip("bogus") == "⏳ bogus"


def test_format_bytes_boundaries():
    assert format_bytes(None) == "-"
    assert format_bytes(0) == "-"
    assert format_bytes(-5) == "-"
    assert format_bytes(1) == "1.0B"
    assert format_bytes(1023) == "1023.0B"
    assert format_bytes(1024) == "1.0KB"
    assert format_bytes(1536) == "1.5KB"
    assert format_bytes(1024**2) == "1.0MB"
    assert format_bytes(1024**3) == "1.0GB"
    assert format_bytes(1024**4) == "1.0TB"
    # capped at TB — never overflows the unit table
    assert format_bytes(1024**5) == "1024.0TB"


def test_shape_badge():
    assert shape_badge(10, 3) == "10×3"
    assert shape_badge(None, 3) == "?×3"
    assert shape_badge(10, None) == "10×?"
    assert shape_badge(None, None) == "?×?"
