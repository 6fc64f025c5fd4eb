"""Distributed rulepack runner + deterministic report assembly.

Mirrors the reference's report contract (``rulepack_runner.py:104-302``):
``engine / attestation / metadata / summary{pass,warn,fail} / resources[]``
with rules executed in sorted-id order and statuses tallied identically.
Execution is Spark-side: one fused aggregate pass per input computes every
rule's violation count; evidence passes run only for failing rules
(see operators/rules.py). Exit-code contract: callers exit 1 iff any FAIL
(``cli/validate.py:128``).

Adds the north-rule *per-partition shareable validation report*: a parquet
``_reports`` table of (input, partition_key, rule_id, violations, rows) so
each partition's validation outcome can be shared/consumed independently at
10^12-row scale without the driver aggregating raw evidence.
"""

from __future__ import annotations

import dataclasses
import datetime as _dt
import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fairy_core_spark import __version__ as ENGINE_VERSION
from fairy_core_spark.operators.rules import CompiledRule, RuleContext, compile_rule
from fairy_core_spark.plans.provenance import (
    compute_dataset_id,
    compute_params_sha256,
    fixed_timestamp_or,
    sha256_file,
    table_fingerprint,
)
from fairy_core_spark.rulepack.loader import Rulepack, rulepack_from_dict
from fairy_core_spark.sources.tables import (
    ROW_ID,
    read_input,
    with_row_id_by_order,
    with_row_id_ingest,
)


def _now_iso() -> str:
    return _dt.datetime.now(_dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def run_rulepack(
    spark: SparkSession,
    inputs_map: dict[str, str],
    rulepack: Rulepack | dict,
    rp_path: str = "",
    now_iso: str | None = None,
    params: dict[str, Any] | None = None,
    max_evidence_rows: int = 10_000,
    frames: dict[str, DataFrame] | None = None,
    evidence_out: str | None = None,
) -> dict[str, Any]:
    """Validate named inputs against a rulepack; return the report dict.

    ``inputs_map``: name -> path (csv/tsv/parquet). Pre-built DataFrames can
    be passed via ``frames`` (they must carry ``__row_id``); paths are then
    used only for attestation echo.
    """
    if isinstance(rulepack, dict):
        rulepack = rulepack_from_dict(rulepack)
    now_iso = fixed_timestamp_or(now_iso or _now_iso())

    loaded: dict[str, DataFrame] = {}
    raw_cached: list[DataFrame] = []
    for name, path in inputs_map.items():
        if frames and name in frames:
            # caller-provided frames keep their own partitioning: probing
            # df.rdd here would finalize the plan under AQE (an extra job
            # per input, e.g. the global-sort exchange on the
            # with_row_id_by_order path) just to read a partition count
            df = frames[name]
            if ROW_ID not in df.columns:
                df = with_row_id_by_order(df)
        else:
            # cache the raw parse first: row-id assignment needs a counts
            # pass + a main pass, and CSV parsing is the expensive part —
            # one parse, not two (parquet barely cares, CSV is ~2x)
            raw = read_input(spark, path, row_id=False).cache()
            # a single mid-size CSV yields few input splits — rebalance so
            # the fused agg + evidence passes use every core. The partition
            # probe runs on the RAW file scan (split planning only, no job —
            # unlike probing the row-id plan, whose exchanges AQE would
            # materialize); an input already wider than the core count is
            # left alone rather than shuffled down.
            n_raw = raw.rdd.getNumPartitions()
            df = with_row_id_ingest(raw)
            raw_cached.append(raw)
            if n_raw < spark.sparkContext.defaultParallelism:
                df = df.repartition(spark.sparkContext.defaultParallelism)
        loaded[name] = df.cache()  # each input is scanned by fused agg + evidence passes

    # ---- attestation (reference :131-170); file hash driver-side for real
    # files, snapshot fingerprint for table dirs
    att_inputs = []
    for name, path in inputs_map.items():
        try:
            n = loaded[name].count()
            if os.path.isfile(path):
                sha, nbytes = sha256_file(path), os.path.getsize(path)
            elif os.path.isdir(path):
                sha = table_fingerprint(path)
                nbytes = sum(
                    os.path.getsize(os.path.join(r, f))
                    for r, _d, fs in os.walk(path)
                    for f in fs
                )
            else:
                sha, nbytes = "", 0
            att_inputs.append(
                {"name": name, "path": str(path), "sha256": sha, "bytes": int(nbytes), "rows": int(n)}
            )
        except Exception:
            att_inputs.append({"name": name, "path": str(path), "sha256": "", "bytes": 0, "rows": 0})

    rulepack_obj = {"id": rulepack.id, "version": rulepack.version, "path": str(rp_path)}
    report: dict[str, Any] = {
        "engine": {"fairy_core_version": ENGINE_VERSION},
        "attestation": {
            "core_version": ENGINE_VERSION,
            "rulepack": rulepack_obj,
            "inputs": att_inputs,
            "timestamp": now_iso,
            "fairy_core_version": ENGINE_VERSION,
            "rulepack_name": rulepack.id or "UNKNOWN_RULEPACK",
            "rulepack_version": rulepack.version or "0.0.0",
            "rulepack_source_path": str(rp_path),
        },
        "metadata": {"inputs": {k: str(v) for k, v in inputs_map.items()}},
        "summary": {"pass": 0, "warn": 0, "fail": 0},
        "resources": [],
    }

    params_sha = compute_params_sha256(params)
    report["attestation"]["dataset_id"] = compute_dataset_id(
        {a["name"]: a["sha256"] for a in att_inputs},
        rulepack.id,
        rulepack.version,
        rulepack.sha256,
        params_sha,
    )

    for name, path in inputs_map.items():
        df = loaded[name]
        ctx = RuleContext(
            df=df,
            frames=loaded,
            max_evidence_rows=max_evidence_rows,
            evidence_out=evidence_out,
            input_name=name,
        )
        filename = os.path.basename(str(path))
        rules = rulepack.rules_for(name, filename)

        compiled: list[CompiledRule] = [
            compile_rule(
                r, [c for c in df.columns if c != ROW_ID], list(loaded.keys()), ordinal=i
            )
            for i, r in enumerate(rules)
        ]

        # fused single-pass aggregation across every rule of this input
        agg_exprs = []
        for cr in compiled:
            agg_exprs.extend(col.alias(k) for k, col in cr.agg_exprs.items())
        aggs: dict[str, Any] = {}
        if agg_exprs:
            aggs = df.agg(*agg_exprs).collect()[0].asDict()

        def _finalize_one(cr: CompiledRule) -> tuple[str, dict]:
            if cr.error is not None:
                return cr.error
            try:
                # per-rule context clone (finalizers run concurrently): the
                # truncated list object is shared, current_rule is private
                rctx = dataclasses.replace(ctx, current_rule=cr.rule.id)
                return cr.finalize(aggs, rctx)
            except Exception as e:  # runtime_error contract (:277-278)
                return "FAIL", {"error": "runtime_error", "message": str(e)}

        # evidence jobs are independent filter+sort+limit actions over the
        # cached input — run them as concurrent Spark jobs (threads), the
        # report keeps rule order via ex.map. ~2x on multi-failing packs.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, max(1, len(compiled)))) as ex:
            finalized = list(ex.map(_finalize_one, compiled))

        resource_rules = []
        for cr, (status, evidence) in zip(compiled, finalized):
            resource_rules.append(
                {
                    "id": cr.rule.id,
                    "type": cr.rule.type,
                    "severity": cr.rule.severity,
                    "status": status,
                    "evidence": evidence,
                }
            )
            k = "fail" if status == "FAIL" else ("warn" if status == "WARN" else "pass")
            report["summary"][k] += 1

        resource = {"name": name, "path": str(path), "rules": resource_rules}
        if ctx.truncated:
            # set-dedupe: concurrent finalizers share the list and the
            # check-then-append in sink_overflow can interleave
            resource["evidence_truncated"] = {
                "rules": sorted(set(ctx.truncated)),
                "evidence_out": evidence_out,
            }
        report["resources"].append(resource)

    for df in loaded.values():
        df.unpersist()
    for df in raw_cached:
        df.unpersist()
    return report


def partition_report(
    df: DataFrame,
    rule_preds: dict[str, Any],
    partition_key,
    input_name: str = "default",
) -> DataFrame:
    """North-rule per-partition validation report: violation counts per
    (partition_key, rule). One map-side-combinable groupBy; write the
    result as a parquet reports table (tests/test_rule_parity.py does,
    through ParquetDirCatalog) so downstream consumers can gate
    per-partition without re-validating."""
    if not rule_preds:
        raise ValueError("partition_report: rule_preds must not be empty")
    aggs = [F.count(F.lit(1)).alias("rows")] + [
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(f"__v{i}")
        for i, pred in enumerate(rule_preds.values())
    ]
    wide = df.groupBy(partition_key.alias("partition_key")).agg(*aggs)
    # long form via explode(array(struct)) — rule ids ride as literals, so
    # ids containing quotes/backticks can't break a generated stack() SQL
    kv = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(rid).alias("rule_id"),
                    F.col(f"__v{i}").alias("violations"),
                )
                for i, rid in enumerate(rule_preds)
            ]
        )
    ).alias("kv")
    return wide.select("partition_key", "rows", kv).select(
        F.lit(input_name).alias("input"),
        "partition_key",
        F.col("kv.rule_id").alias("rule_id"),
        F.col("kv.violations").alias("violations"),
        "rows",
    )


def write_report_json(report: dict[str, Any], path: str) -> None:
    """Deterministic JSON sink (reference ``cli/validate.py:118-122``)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
        f.write("\n")


def write_report_markdown(report: dict[str, Any], path: str) -> None:
    """Deterministic curator one-pager (same role as the reference's
    ``write_markdown``, ``rulepack_runner.py:829-936`` — own format, pure
    function of the report dict)."""
    s = report["summary"]
    lines = [
        "# Validation report",
        "",
        f"- rulepack: `{report['attestation']['rulepack_name']}`"
        f" v{report['attestation']['rulepack_version']}",
        f"- generated: {report['attestation']['timestamp']}",
        f"- dataset_id: `{report['attestation'].get('dataset_id', '')}`",
        f"- summary: {s['pass']} pass / {s['warn']} warn / {s['fail']} fail",
        "",
    ]
    for res in report["resources"]:
        lines.append(f"## {res['name']}")
        lines.append("")
        lines.append("| rule | type | severity | status | count |")
        lines.append("|---|---|---|---|---|")
        for r in res["rules"]:
            ev = r.get("evidence", {}) or {}
            count = ev.get("count")
            if count is None:
                # rule shapes that carry their count under a nested/other
                # key: enum (out_of_set), range (out_of_bounds), foreign_key
                # (missing_count_estimate) — without these a FAILing fk rule
                # would render count 0
                for nested in ("out_of_set", "out_of_bounds"):
                    sub = ev.get(nested)
                    if isinstance(sub, dict) and "count" in sub:
                        count = sub["count"]
                        break
            if count is None:
                count = ev.get("missing_count_estimate", 0)
            lines.append(
                f"| {r['id']} | {r['type']} | {r['severity']} | {r['status']} | {count} |"
            )
        lines.append("")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines))
