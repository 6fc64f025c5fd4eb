"""Preflight v1 report runner: the reference's ``fairy preflight`` contract
(``core/services/validator.py:79-346``) on Spark inputs.

Stable schema 1.0.0: ``schema_version, generated_at, dataset_id,
dataset_id_method, metadata{inputs,rulepack,params}, summary{by_level,
by_rule,submission_ready}, results[]{rule,level,count,samples<=10}`` plus the
engine/attestation echoes and the deprecated ``_legacy`` block — shapes
locked by the reference's schema drift guard
(``tests/schema/test_schema_drift_guard.py:22-61``).

Distributed semantics: every check runs as Column expressions
(operators/preflight.py); findings counts aggregate executor-side; only the
<=10 samples per rule that reach the report are collected (sorted by
(row, column, str(value)) exactly as ``core/services/transform.py:33-52``,
including the reference's 0-based->1-based row quirk at :118-127).
"""

from __future__ import annotations

import datetime as _dt
import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fairy_core_spark import __version__ as ENGINE_VERSION
from fairy_core_spark.operators import preflight as pf
from fairy_core_spark.plans.provenance import (
    compute_dataset_id,
    compute_params_sha256,
    fixed_timestamp_or,
    sha256_file,
    table_fingerprint,
)
from fairy_core_spark.sources.tables import read_input

CANON_VERSION_V1 = "fairy-canon-1"


def _now_z() -> str:
    return _dt.datetime.now(_dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def _dispatch(spark, rule: dict, samples: DataFrame, files: DataFrame) -> DataFrame:
    """validator.py:111-167 dispatch table."""
    spec = rule["check"]
    ctype = spec["type"]
    if ctype == "require_columns":
        return pf.check_required_columns(spark, samples, spec.get("required_columns", []))
    if ctype == "at_least_one_nonempty_per_row":
        # reference parity: only column_groups[0] is evaluated
        # (validator.py:121-125 — "group0 = column_groups[0]"; rna.py:129
        # documents the spec as spec['column_groups'][0])
        groups = spec.get("column_groups", [])
        return pf.check_bio_context(spark, samples, groups[0] if groups else [])
    if ctype == "id_crosscheck":
        return pf.check_id_crossmatch(spark, samples, files, spec.get("left_key", "sample_id"))
    if ctype == "paired_end_complete":
        return pf.check_paired_end_complete(
            spark,
            files,
            samples_key=spec.get("samples_key", "sample_id"),
            layout_col=spec.get("layout_column", "layout"),
            paired_value=spec.get("layout_value_for_paired", "PAIRED"),
            file_col=spec.get("file_column", "filename"),
            r1_pattern=spec.get("r1_pattern", r"_R1"),
            r2_pattern=spec.get("r2_pattern", r"_R2"),
        )
    if ctype == "dates_are_iso8601":
        return pf.check_dates_iso8601(spark, samples, spec.get("columns", []))
    if ctype == "processed_data_present":
        return pf.check_processed_data_present(
            spark,
            files,
            samples_key=spec.get("samples_key", "sample_id"),
            raw_file_glob=spec.get("raw_file_glob", ".fastq"),
            processed_globs=tuple(
                spec.get("processed_glob_candidates", [".counts", ".quant", ".gene_counts"])
            ),
        )
    # reference parity: an unknown check type yields ZERO findings (the
    # rule reports pass) — validator.py:166-167's bare `else: warning_items
    # = []`. Deliberately unlike the rulepack dialect, which FAILs with
    # unknown_rule_type (rules.py dispatch end).
    return pf._empty(spark)


def _sample_from_row(r: dict) -> dict:
    """transform.py:105-141 sample shaping, incl. the 0->1-based quirk:
    row>=1 kept as-is, row==0 becomes 1."""
    sample: dict[str, Any] = {}
    row = r["row0"]
    if row is not None:
        row = int(row)
        if row >= 1:
            sample["row"] = row
        elif row >= 0:
            sample["row"] = row + 1
    if r["column"]:
        sample["column"] = r["column"]
    if r["message"]:
        sample["message"] = r["message"]
    if r["hint"]:
        sample["hint"] = r["hint"]
    return sample


def run_preflight(
    spark: SparkSession,
    rulepack: dict,
    rulepack_path: str,
    samples_path: str,
    files_path: str,
    params: dict | None = None,
) -> dict[str, Any]:
    """Returns the v1 report dict. Exit-code contract for CLIs: 0 iff
    ``summary.submission_ready`` (cmd_preflight.py:358)."""
    samples = read_input(spark, samples_path, row_id=True).cache()
    files = read_input(spark, files_path, row_id=True).cache()

    meta = rulepack.get("meta") or {}
    rp_name = meta.get("name") or rulepack.get("rulepack_name") or "UNKNOWN_RULEPACK"
    rp_id = meta.get("id") or rulepack.get("rulepack_id") or rp_name
    rp_version = meta.get("version") or rulepack.get("rulepack_version") or "0.0.0"
    rp_sha256 = (
        sha256_file(rulepack_path)
        if os.path.isfile(rulepack_path)  # isfile, not exists: a dir here
        else ""  # would IsADirectoryError inside sha256_file
    )
    params_sha256 = compute_params_sha256(params)

    # ---- run every check, tagging findings with the rule code; one union
    # consumed by TWO actions (counts groupBy + top-10 window) — cache it
    # so the crossmatch/paired-end joins behind it execute once, not twice
    tagged = None
    rules = rulepack["rules"]
    for rule in rules:
        f = _dispatch(spark, rule, samples, files).withColumn("code", F.lit(rule["code"]))
        tagged = f if tagged is None else tagged.unionByName(f)
    if tagged is not None:
        tagged = tagged.cache()

    results = []
    by_level = {"pass": 0, "warn": 0, "fail": 0}
    by_rule: dict[str, str] = {}
    total_counts: dict[str, int] = {}
    severities: dict[str, set] = {}
    samples_by_code: dict[str, list[dict]] = {}

    if tagged is not None:
        counts = {
            r["code"]: (int(r["n"]), r["sevs"])
            for r in tagged.groupBy("code")
            .agg(F.count(F.lit(1)).alias("n"), F.collect_set("severity").alias("sevs"))
            .collect()
        }
        total_counts = {k: v[0] for k, v in counts.items()}
        severities = {k: set(v[1]) for k, v in counts.items()}
        # top-10 samples per rule, sorted as transform.py:33-52 (None row ->
        # 0, None column -> ''); collect only what the report shows
        w = Window.partitionBy("code").orderBy(
            F.coalesce(F.col("row0"), F.lit(-1)),  # row0=-1 sorts like row None->0 pre-quirk
            F.coalesce(F.col("column"), F.lit("")),
            F.coalesce(F.col("message"), F.lit("")),
        )
        top = (
            tagged.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= 10)
            .collect()
        )
        for r in top:
            samples_by_code.setdefault(r["code"], []).append(_sample_from_row(r.asDict()))
        tagged.unpersist()

    for rule in rules:
        code = rule["code"]
        n = total_counts.get(code, 0)
        sevs = severities.get(code, set())
        if n == 0:
            level = "pass"
        elif "error" in sevs:
            level = "fail"
        elif "warning" in sevs:
            level = "warn"
        else:
            level = "pass"
        res_samples = samples_by_code.get(code, [])
        # reference sorts by (row, column, str(value)) AFTER the quirk is
        # not applied (sort first, then shape); our window sorted pre-shape
        # on the same keys, so order matches
        results.append({"rule": code, "level": level, "count": n, "samples": res_samples})
        by_level[level] = by_level.get(level, 0) + 1
        cur = by_rule.get(code)
        if cur is None or level == "fail" or (level == "warn" and cur == "pass"):
            by_rule[code] = level
    by_rule = dict(sorted(by_rule.items()))
    results = sorted(results, key=lambda r: (r.get("rule", ""), r.get("level", "")))

    # ---- metadata.inputs (summarize_tabular contract: path/sha256/rows/cols/header)
    inputs_metadata = {}
    for name, path in sorted({"files": files_path, "samples": samples_path}.items()):
        df = samples if name == "samples" else files
        header = [c for c in df.columns if c != "__row_id"]
        inputs_metadata[name] = {
            "path": str(path),
            # parquet table DIRS are valid read_input targets; hash them as
            # tables (run_rulepack does the same) — sha256_file would raise
            # IsADirectoryError after all the Spark work completed
            "sha256": table_fingerprint(path) if os.path.isdir(path) else sha256_file(path),
            "n_rows": df.count(),
            "n_cols": len(header),
            "header": header,
        }

    dataset_id = compute_dataset_id(
        {k: v["sha256"] for k, v in inputs_metadata.items()},
        rp_id,
        rp_version,
        rp_sha256,
        params_sha256,
    )
    timestamp = fixed_timestamp_or(_now_z())
    if timestamp.endswith("+00:00"):
        timestamp = timestamp.replace("+00:00", "Z")

    report = {
        "schema_version": "1.0.0",
        "generated_at": timestamp,
        "dataset_id": dataset_id,
        "dataset_id_method": {
            "algorithm": "sha256",
            "canon_version": CANON_VERSION_V1,
            "includes": ["inputs.sha256", "rulepack.sha256", "params.sha256"],
        },
        "metadata": {
            "inputs": inputs_metadata,
            "rulepack": {
                "path": str(rulepack_path),
                "sha256": rp_sha256,
                "id": rp_id,
                "version": rp_version,
                "params_sha256": params_sha256,
            },
            "params": {"sha256": params_sha256},
        },
        "summary": {
            "by_level": by_level,
            "by_rule": by_rule,
            "submission_ready": by_level.get("fail", 0) == 0,
        },
        "results": results,
        "engine": {"fairy_core_version": ENGINE_VERSION},
        "attestation": {
            "rulepack_name": rp_name,
            "rulepack_version": rp_version,
            "rulepack_source_path": str(rulepack_path),
        },
    }
    samples.unpersist()
    files.unpersist()
    return report


def write_preflight_outputs(report: dict, out_dir: str) -> None:
    """CLI artifact layout (cmd_preflight.py:231-295): report JSON + MD."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "preflight_report.json"), "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
        f.write("\n")
    s = report["summary"]
    lines = [
        "# Preflight report",
        "",
        f"- generated: {report['generated_at']}",
        f"- dataset_id: `{report['dataset_id']}`",
        f"- submission_ready: **{s['submission_ready']}**",
        f"- levels: {s['by_level']}",
        "",
        "| rule | level | count |",
        "|---|---|---|",
    ]
    for r in report["results"]:
        lines.append(f"| {r['rule']} | {r['level']} | {r['count']} |")
    with open(os.path.join(out_dir, "preflight_report.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
