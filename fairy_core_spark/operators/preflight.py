"""GEO-profile preflight cross-table checks, Spark-native.

Distributed re-implementation of the reference's six preflight check types
(``src/fairy/core/validators/rna.py:45-358``, dispatched by
``core/services/validator.py:111-167``), preserving finding shapes (kind,
message, hint, severity, 0-based row index) while replacing every per-row
pandas loop with Column expressions:

- require_columns      driver-side schema diff          (rna.py:45-69)
- at_least_one_nonempty_per_row  greatest-of-trims filter (rna.py:122-157)
- id_crosscheck        blank filter + left-anti join     (rna.py:160-211)
- paired_end_complete  groupBy + max(rlike) flags        (rna.py:214-272)
- dates_are_iso8601    regex filter per column           (rna.py:275-308)
- processed_data_present groupBy + max(contains) flags   (rna.py:311-358)

Each check returns a *findings DataFrame* with schema
(row0 long, column string, kind string, message string, hint string,
severity string) — row0 is the reference's 0-based pandas index, i.e.
``__row_id - 1``. Counts aggregate distributed; only the <=10 samples per
rule that reach the report are ever collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fairy_core_spark.sources.tables import ROW_ID

FINDING_SCHEMA = (
    "row0 long, column string, kind string, message string, hint string, severity string"
)


def _empty(spark) -> DataFrame:
    return spark.createDataFrame([], FINDING_SCHEMA)


def _finding_cols(row0, column, kind: str, message, hint: str, severity: str):
    return [
        row0.cast("long").alias("row0"),
        (F.lit(column) if isinstance(column, (str, type(None))) else column).alias("column"),
        F.lit(kind).alias("kind"),
        message.alias("message"),
        F.lit(hint).alias("hint"),
        F.lit(severity).alias("severity"),
    ]


def check_required_columns(spark, df: DataFrame, required_cols: list[str]) -> DataFrame:
    """FAIL per missing required column (rna.py:45-69). Driver-side: the
    schema is known before execution."""
    rows = [
        (
            None,
            col,
            "missing_column",
            f"Required column '{col}' is missing.",
            "Add this column before submission.",
            "error",
        )
        for col in required_cols
        if col not in df.columns
    ]
    return spark.createDataFrame(rows, FINDING_SCHEMA) if rows else _empty(spark)


def check_bio_context(spark, samples: DataFrame, group_cols: list[str]) -> DataFrame:
    """at_least_one_nonempty_per_row (rna.py:122-157): flag sample rows
    where every column of the group is blank. iterrows -> one filter."""
    present = [c for c in group_cols if c in samples.columns]
    if present:
        any_filled = None
        for c in present:
            filled = F.trim(F.col(c).cast("string")) != ""
            filled = F.coalesce(filled, F.lit(False))
            any_filled = filled if any_filled is None else (any_filled | filled)
        bad = samples.where(~any_filled)
    else:
        bad = samples  # no context columns at all -> every row flagged
    row0_str = (F.col(ROW_ID) - 1).cast("string")
    sid = (
        F.coalesce(F.col("sample_id").cast("string"), F.concat(F.lit("row_"), row0_str))
        if "sample_id" in samples.columns
        else F.concat(F.lit("row_"), row0_str)
    )
    msg = F.concat(
        F.lit("Sample '"), sid, F.lit("' does not provide tissue/cell_line/cell_type.")
    )
    return bad.select(
        *_finding_cols(
            F.col(ROW_ID) - 1,
            None,
            "bio_context_missing",
            msg,
            "Fill at least one of: tissue, cell_line, or cell_type.",
            "error",
        )
    )


def check_id_crossmatch(
    spark, samples: DataFrame, files: DataFrame, samples_key: str = "sample_id"
) -> DataFrame:
    """id_crosscheck (rna.py:160-211): blank file ids + ids unknown to
    samples. Set-membership becomes a broadcast left-anti join on the
    trimmed key (samples' distinct keys are small; at scale Catalyst/AQE
    picks the strategy)."""
    if samples_key not in samples.columns or samples_key not in files.columns:
        return _empty(spark)
    sid = F.trim(F.coalesce(F.col(samples_key).cast("string"), F.lit("")))
    blank = files.where(sid == "").select(
        *_finding_cols(
            F.col(ROW_ID) - 1,
            samples_key,
            "file_missing_sample_id",
            F.lit("Row in files.tsv has no sample_id."),
            "Each file row must name the sample_id it belongs to.",
            "error",
        )
    )
    known = (
        samples.select(sid.alias("__sid"))
        .where(F.col("__sid") != "")
        .distinct()
    )
    unknown = (
        files.withColumn("__sid", sid)
        .where(F.col("__sid") != "")
        .join(known, "__sid", "left_anti")
    )
    unknown_f = unknown.select(
        *_finding_cols(
            F.col(ROW_ID) - 1,
            samples_key,
            "file_unknown_sample_id",
            F.concat(
                F.lit("File references sample_id '"),
                F.col("__sid"),
                F.lit("' not found in samples.tsv."),
            ),
            "Fix sample_id or add that sample to samples.tsv.",
            "error",
        )
    )
    return blank.unionByName(unknown_f)


def check_paired_end_complete(
    spark,
    files: DataFrame,
    samples_key: str = "sample_id",
    layout_col: str = "layout",
    paired_value: str = "PAIRED",
    file_col: str = "filename",
    r1_pattern: str = r"_R1",
    r2_pattern: str = r"_R2",
) -> DataFrame:
    """paired_end_complete (rna.py:214-272): per paired sample, require a
    filename matching each mate pattern. groupBy + max(rlike) flags."""
    if layout_col not in files.columns or file_col not in files.columns:
        return _empty(spark)
    paired = files.where(
        F.upper(F.coalesce(F.col(layout_col).cast("string"), F.lit(""))) == paired_value.upper()
    )
    fn = F.col(file_col).cast("string")
    grouped = paired.groupBy(F.col(samples_key).alias("__sid")).agg(
        F.max(F.coalesce(fn.rlike(r1_pattern), F.lit(False)).cast("int")).alias("has_r1"),
        F.max(F.coalesce(fn.rlike(r2_pattern), F.lit(False)).cast("int")).alias("has_r2"),
        (F.min(F.col(ROW_ID)) - 1).alias("first_idx"),
    )
    bad = grouped.where((F.col("has_r1") == 0) | (F.col("has_r2") == 0))
    return bad.select(
        *_finding_cols(
            F.col("first_idx"),
            file_col,
            "paired_end_incomplete",
            F.concat(
                F.lit("Paired-end sample '"),
                F.col("__sid").cast("string"),
                F.lit("' is missing R1 or R2 FASTQ."),
            ),
            "Provide both *_R1* and *_R2* files for each paired-end sample.",
            "error",
        )
    )


def check_dates_iso8601(spark, samples: DataFrame, date_cols: list[str]) -> DataFrame:
    """dates_are_iso8601 (rna.py:275-308): non-empty values must match
    YYYY-MM-DD; WARN."""
    out = None
    for col in date_cols:
        if col not in samples.columns:
            continue
        val = F.trim(F.coalesce(F.col(col).cast("string"), F.lit("")))
        bad = samples.where((val != "") & ~val.rlike(r"^\d{4}-\d{2}-\d{2}$"))
        f = bad.select(
            *_finding_cols(
                F.col(ROW_ID) - 1,
                col,
                "invalid_iso8601_date",
                F.concat(
                    F.lit("Value '"),
                    val,
                    F.lit(f"' in {col} is not ISO8601 (YYYY-MM-DD)."),
                ),
                "Use format YYYY-MM-DD, e.g. 2025-10-02.",
                "warning",
            )
        )
        out = f if out is None else out.unionByName(f)
    return out if out is not None else _empty(spark)


def check_processed_data_present(
    spark,
    files: DataFrame,
    samples_key: str = "sample_id",
    raw_file_glob: str = ".fastq",
    processed_globs: tuple[str, ...] = (".counts", ".quant", ".gene_counts"),
) -> DataFrame:
    """processed_data_present (rna.py:311-358): samples with raw files but
    no processed outputs; WARN. Substring containment per the reference."""
    if samples_key not in files.columns:
        return _empty(spark)
    fn = F.coalesce(F.col("filename").cast("string"), F.lit("")) if "filename" in files.columns else F.lit("")
    is_raw = fn.contains(raw_file_glob).cast("int")
    is_proc = None
    for g in processed_globs:
        c = fn.contains(g).cast("int")
        is_proc = c if is_proc is None else F.greatest(is_proc, c)
    grouped = files.groupBy(F.col(samples_key).alias("__sid")).agg(
        F.max(is_raw).alias("has_raw"),
        F.max(is_proc if is_proc is not None else F.lit(0)).alias("has_proc"),
        (F.min(F.col(ROW_ID)) - 1).alias("first_idx"),
    )
    bad = grouped.where((F.col("has_raw") == 1) & (F.col("has_proc") == 0))
    return bad.select(
        *_finding_cols(
            F.col("first_idx"),
            "filename",
            "no_processed_files",
            F.concat(
                F.lit("Sample '"),
                F.col("__sid").cast("string"),
                F.lit("' has raw data but no processed/quant files."),
            ),
            "Include at least one processed output (e.g. counts matrix).",
            "warning",
        )
    )
