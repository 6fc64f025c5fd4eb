"""Legacy process_csv shim (reference validation/process_csv.py:23-36):
returns (meta, df) where meta echoes the Meta summary plus file identity.

Spark recast: df is a Spark DataFrame (all-string ingest contract), the
meta dict is assembled from validate_csv's bounded Meta — the file sha256
is the only driver-side file read (streamed, 64 KiB chunks)."""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame

from fairy_core_spark.plans.provenance import sha256_file
from fairy_core_spark.sources.tables import read_input
from fairy_core_spark.validation_api import validate_csv


def process_csv(path: str, kind: str = "rna") -> tuple[dict[str, Any], DataFrame]:
    """Returns (meta, df). Meta fields mirror the reference shim:
    filename/sha256/n_rows/n_cols/fields_validated/warnings (as dicts)."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        from fairy_core_spark.session import get_spark

        spark = get_spark(app_name="fairy-process-csv")
    df = read_input(spark, path)
    m = validate_csv(path, kind=kind)
    meta = {
        "filename": os.path.basename(path),
        "sha256": sha256_file(path),
        "n_rows": m.n_rows,
        "n_cols": m.n_cols,
        "fields_validated": m.fields_validated,
        "warnings": [w.__dict__ for w in m.warnings],
    }
    return meta, df
