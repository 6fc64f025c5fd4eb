"""Regenerate fairy_core_spark/goldens/gate_fingerprints.json.

Run at the START of a round, BEFORE changing code, so the snapshot records
the fingerprints of the tree the previous round's driver gate certified.
Entries whose fingerprints later diverge from this snapshot serve first in
queries()/oracle_sql() (see fairy_core_spark/gate.py).

Usage: python scripts/gen_gate_fingerprints.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> int:
    from fairy_core_spark import gate
    from fairy_core_spark.queries import _ORACLES, _QUERIES

    fps = gate.entry_fingerprints(_QUERIES, _ORACLES)
    payload = {
        "note": (
            "fingerprints of each gate entry's full implementation "
            "(fn source + oracle SQL + transitive package module bytes) "
            "as of the last certified round; regenerate at round start "
            "before changing code"
        ),
        "fingerprints": dict(sorted(fps.items())),
    }
    gate.SNAPSHOT_PATH.write_text(json.dumps(payload, indent=1, sort_keys=True) + "\n")
    print(f"wrote {gate.SNAPSHOT_PATH} ({len(fps)} entries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
