"""Package fairy_core_spark into a --py-files zip (north rule: jobs are
submitted via ``spark-submit --py-files``). Pure-source zip: executors
need nothing else (numpy/pandas/pyarrow ship with the cluster image).

Usage: python scripts/make_submit_zip.py [out_zip]   (default dist/fairy_core_spark.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "fairy_core_spark.zip")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "fairy_core_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
                    n += 1
    print(f"wrote {out} ({n} modules)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
