"""Built-in library validators (reference core/validators/rna.py:13-39,
generic.py:11-29), registered at import via validation_api.register.

Semantics preserved from the reference, recast as Spark plans:

- RNA: required columns ([sample_id]), not_null on sample_id (error, per
  row), read_length numeric >= 1 (warning, per row; non-numeric/blank
  coerces to violation), fields_validated = sorted(present & known),
  warnings capped at 200 — the cap is pushed into the plan as
  ``sort(row) LIMIT cap`` so only <= cap rows ever reach the driver.
- Generic: shape summary + first 50 columns, no warnings.

Row numbers are the reference's pandas 0-based index, reproduced by the
deterministic ingest row id (file order; sources/tables.read_input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fairy_core_spark.sources.tables import ROW_ID, read_input
from fairy_core_spark.validation_api import Meta, WarningItem, register

_WARN_CAP = 200


def _spark() -> SparkSession:
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    from fairy_core_spark.session import get_spark

    return get_spark(app_name="fairy-validate-csv")


def _bad_rows(df: DataFrame, pred, cap: int) -> list[int]:
    """0-based row indices matching pred, ascending, capped (the cap bounds
    the collect — full evidence stays distributed)."""
    rows = (
        df.where(pred)
        .select((F.col(ROW_ID) - 1).alias("r"))
        .orderBy("r")
        .limit(cap)
        .collect()
    )
    return [int(x["r"]) for x in rows]


class RNAValidator:
    name = "rna"
    version = "0.1.0"

    REQUIRED = ["sample_id"]
    OPTIONAL = ["collection_date", "tissue", "cell_line", "cell_type", "read_length"]

    def validate(self, path: str) -> Meta:
        spark = _spark()
        df = read_input(spark, path, row_id=True)
        cols = [c for c in df.columns if c != ROW_ID]
        n_rows = df.count()

        warnings: list[WarningItem] = []
        # check_required_columns (rna.py:47-69): header-level, error
        for col in self.REQUIRED:
            if col not in cols:
                warnings.append(
                    WarningItem(
                        column=col,
                        kind="missing_column",
                        message=f"Required column '{col}' is missing.",
                        severity="error",
                        row=None,
                        hint="Add this column before submission.",
                    )
                )
        # check_not_null (rna.py:72-91): per-row, error
        if "sample_id" in cols:
            nullish = F.col("sample_id").isNull() | (F.trim(F.col("sample_id")) == "")
            for r in _bad_rows(df, nullish, _WARN_CAP):
                warnings.append(
                    WarningItem(
                        column="sample_id",
                        kind="missing_value",
                        message="Missing value in required field 'sample_id'.",
                        severity="error",
                        row=r,
                        hint="Fill this cell.",
                    )
                )
        # check_read_length (rna.py:94-115): numeric coerce, < 1 warns
        if "read_length" in cols:
            rl = F.coalesce(F.col("read_length").try_cast("double"), F.lit(-1.0))
            for r in _bad_rows(df, rl < 1, _WARN_CAP):
                warnings.append(
                    WarningItem(
                        column="read_length",
                        kind="invalid_read_length",
                        message="read_length must be >= 1",
                        severity="warning",
                        row=r,
                        hint="Use an integer read length like 50, 75, 100...",
                    )
                )

        fields = [c for c in cols if c in set(self.REQUIRED + self.OPTIONAL)]
        return Meta(
            n_rows=n_rows,
            n_cols=len(cols),
            fields_validated=sorted(fields),
            warnings=warnings[:_WARN_CAP],
        )


class GenericCSVValidator:
    name = "generic"
    version = "0.1.0"

    def validate(self, path: str) -> Meta:
        spark = _spark()
        df = read_input(spark, path, row_id=False)
        cols = list(df.columns)
        return Meta(
            n_rows=df.count(),
            n_cols=len(cols),
            fields_validated=cols[:50],
            warnings=[],
        )


register("rna", RNAValidator())
register("generic", GenericCSVValidator())
