"""CLI mirroring the reference's two entry points on Spark.

``python -m fairy_core_spark.cli validate --inputs name=path ... --rulepack rp.yml``
    -> report JSON/MD, exit 1 iff any FAIL (reference ``cli/validate.py:55-128``).

``python -m fairy_core_spark.cli preflight --rulepack rp.json --samples s.tsv
  --files f.tsv --out-dir out/``
    -> preflight_report.json/.md + resolved-codes diff vs the previous run
    (``.fairy_last_run.json`` cache, reference ``cmd_preflight.py:106-118,
    253-257``), exit 0 iff submission_ready (``:358``).

Production submission: ``spark-submit --py-files fairy_core_spark.zip
-m fairy_core_spark.cli ...`` — the module only uses the session factory,
so executors need nothing beyond the zip.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from fairy_core_spark.session import get_spark


def _parse_inputs(pairs: list[str]) -> dict[str, str]:
    out = {}
    for p in pairs:
        if "=" in p:
            name, path = p.split("=", 1)
        else:
            name = os.path.splitext(os.path.basename(p))[0]
            path = p
        out[name] = path
    return out


def _resolve_validate_inputs(args) -> dict[str, str] | int:
    """Input resolution with the reference's legacy contract
    (cli/validate.py:88-110): --inputs name=path pairs win; else the
    positional INPUT is a single file (named 'default') or a folder whose
    *.csv files are loaded stem-named in sorted order. Error paths return
    exit code 2 without starting Spark."""
    if args.inputs:
        return _parse_inputs(args.inputs)
    if not getattr(args, "input", None):
        print("ERROR: provide INPUT or at least one --inputs name=path", file=sys.stderr)
        return 2
    inp = args.input
    if os.path.isdir(inp):
        csvs = sorted(
            f for f in os.listdir(inp) if f.endswith(".csv") and os.path.isfile(os.path.join(inp, f))
        )
        if not csvs:
            print(f"ERROR: no CSV files found in folder: {inp}", file=sys.stderr)
            return 2
        return {os.path.splitext(f)[0]: os.path.join(inp, f) for f in csvs}
    if os.path.isfile(inp):
        return {"default": inp}
    print(f"ERROR: input not found: {inp}", file=sys.stderr)
    return 2


def cmd_validate(args) -> int:
    from fairy_core_spark.plans.report import (
        run_rulepack,
        write_report_json,
        write_report_markdown,
    )
    from fairy_core_spark.rulepack.loader import load_rulepack

    if not os.path.exists(args.rulepack):
        print(f"ERROR: rulepack not found: {args.rulepack}", file=sys.stderr)
        return 2
    inputs = _resolve_validate_inputs(args)
    if isinstance(inputs, int):
        return inputs

    spark = get_spark(app_name="fairy-validate", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    rp = load_rulepack(args.rulepack)
    report = run_rulepack(spark, inputs, rp, rp_path=args.rulepack)
    s = report["summary"]
    print(f"pass={s['pass']} warn={s['warn']} fail={s['fail']}")
    if args.json_out:
        write_report_json(report, args.json_out)
    if args.md_out:
        write_report_markdown(report, args.md_out)
    return 1 if s["fail"] > 0 else 0


def _failing_codes(report: dict) -> set[str]:
    return {
        r["rule"]
        for r in report.get("results", [])
        if r.get("level") in ("fail", "warn")
    }


def _write_preflight_artifacts(report: dict, out_dir: str) -> None:
    """Complete the reference's 4-artifact CLI contract
    (tests/integration/test_cli_preflight_geo_contract.py:13-50,
    cmd_preflight.py:231-295): preflight_report.json/.md are written by
    write_preflight_outputs; this adds manifest.json +
    artifacts/inputs_manifest.json."""
    from fairy_core_spark.plans.manifest import build_manifest_v1
    from fairy_core_spark.plans.provenance import sha256_file
    from fairy_core_spark.plans.report import ENGINE_VERSION

    # inputs manifest (cmd_preflight.py:148-175)
    inputs_md = report.get("metadata", {}).get("inputs", {})
    payload = {
        "schema_version": "inputs-manifest/v0",
        "inputs": [
            {
                "name": name,
                "path": (inputs_md.get(name) or {}).get("path"),
                "sha256": (inputs_md.get(name) or {}).get("sha256"),
            }
            for name in ("samples", "files")
        ],
    }
    art_dir = os.path.join(out_dir, "artifacts")
    os.makedirs(art_dir, exist_ok=True)
    im_path = os.path.join(art_dir, "inputs_manifest.json")
    with open(im_path, "w") as f:
        json.dump(payload, f, ensure_ascii=False, indent=2, sort_keys=True)

    rp_meta = report.get("metadata", {}).get("rulepack", {})
    report_path = os.path.join(out_dir, "preflight_report.json")
    md_path = os.path.join(out_dir, "preflight_report.md")
    files_list = [
        {"path": "preflight_report.json", "sha256": sha256_file(report_path)},
        {"path": "preflight_report.md", "sha256": sha256_file(md_path)},
        {"path": "artifacts/inputs_manifest.json", "sha256": sha256_file(im_path)},
    ]
    manifest = build_manifest_v1(
        dataset_id=report["dataset_id"],
        engine_version=ENGINE_VERSION,
        source_report="preflight_report.json",
        rulepack_id=rp_meta.get("id") or "UNKNOWN_RULEPACK",
        rulepack_version=rp_meta.get("version") or "0.0.0",
        files=files_list,
        created_at_utc=report["generated_at"],
    )
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, ensure_ascii=False, indent=2, sort_keys=True)


def cmd_preflight(args) -> int:
    from fairy_core_spark.plans.preflight_profiles import run_profile
    from fairy_core_spark.plans.preflight_report import write_preflight_outputs

    # hard-fail before creating out_dir if an input path is missing
    # (reference contract test: missing --files must not create out_dir)
    inputs = [args.samples, args.files, args.rulepack]
    if args.param_file:
        inputs.append(args.param_file)
    for p in inputs:
        if not os.path.exists(p):
            print(f"error: input not found: {p}", file=sys.stderr)
            return 2

    spark = get_spark(app_name="fairy-preflight", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    with open(args.rulepack) as f:
        rulepack = json.load(f) if args.rulepack.endswith(".json") else __import__("yaml").safe_load(f)
    params = {}
    if args.param_file:
        import yaml

        with open(args.param_file) as f:
            params = yaml.safe_load(f) or {}
    from fairy_core_spark.plans.preflight_profiles import ProfileNotFoundError, get_registry

    try:
        report = run_profile(
            args.profile,
            spark=spark,
            rulepack=rulepack,
            rulepack_path=args.rulepack,
            inputs={"samples": args.samples, "files": args.files,
                    "input_01": args.samples, "input_02": args.files},
            params=params,
        )
    except ProfileNotFoundError as e:
        ids = ", ".join(get_registry().list_profile_ids())
        print(f"error: {e} (available: {ids})", file=sys.stderr)
        return 2
    out_dir = args.out_dir or "."
    write_preflight_outputs(report, out_dir)
    _write_preflight_artifacts(report, out_dir)

    # resolved-codes diff vs the previous run (cmd_preflight.py:106-118)
    cache_path = os.path.join(out_dir, ".fairy_last_run.json")
    current = sorted(_failing_codes(report))
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            previous = set(json.load(f).get("codes", []))
        resolved = sorted(previous - set(current))
        if resolved:
            print("resolved since last run: " + ", ".join(resolved))
    with open(cache_path, "w") as f:
        json.dump({"codes": current}, f, sort_keys=True)

    s = report["summary"]
    print(
        f"submission_ready={s['submission_ready']} "
        f"levels={json.dumps(s['by_level'], sort_keys=True)}"
    )
    return 0 if s["submission_ready"] else 1


def cmd_rulepack(args) -> int:
    """Shape-check a rulepack without executing it (reference
    cmd_rulepack.py:23-34): exit 2 with the error on a malformed pack, else
    print name/version/rule-count. Never starts Spark."""
    from fairy_core_spark.rulepack.loader import load_rulepack

    try:
        rp = load_rulepack(args.rulepack)
    except Exception as e:  # yaml.YAMLError, json errors, OSError, shape errors
        print(str(e), file=sys.stderr)
        return 2
    print(f"Loaded rulepack '{rp.id}' v{rp.version} with {len(rp.rules)} rule(s).")
    inputs = _parse_inputs(args.inputs)
    if inputs:
        print("Inputs parsed: " + ", ".join(f"{k}={v}" for k, v in inputs.items()))
    return 0


def cmd_run(args) -> int:
    """Legacy v0 single-CSV summarize (reference cli/run.py:378-410 interface
    over the :127-151 payload): resolve the input (file, or folder with
    exactly one CSV), validate via the registry, and either pretty-print the
    v0 payload (--dry-run) or write report.json + report.md to --out."""
    from fairy_core_spark.plans.report_v0 import (
        build_payload_v0,
        emit_markdown_v0,
        resolve_input_path,
        write_report_v0,
    )

    try:
        csv_path = resolve_input_path(args.input)
    except FileNotFoundError as e:
        print(f"ERROR: {e}", file=sys.stderr)
        return 2

    spark = get_spark(app_name="fairy-run", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    payload, _ = build_payload_v0(csv_path, kind=args.kind)
    if args.dry_run:
        print(json.dumps(payload, ensure_ascii=False, indent=2, sort_keys=True))
        return 0
    out_dir = args.out
    report_path = write_report_v0(
        out_dir,
        filename=payload["dataset_id"]["filename"],
        sha256=payload["dataset_id"]["sha256"],
        meta={
            "n_rows": payload["summary"]["n_rows"],
            "n_cols": payload["summary"]["n_cols"],
            "fields_validated": payload["summary"]["fields_validated"],
            "warnings": payload["warnings"],
        },
        input_path=csv_path,
    )
    emit_markdown_v0(os.path.join(out_dir, "report.md"), payload)
    print(f"wrote {report_path}")
    return 0


def demo_alias_main() -> int:
    """Deprecated alias for the old single-CSV interface (reference
    cli/run.py:378-410): same --input/--out/--dry-run/--kind flags,
    forwarded to the ``run`` subcommand with a deprecation warning."""
    print(
        "warning: the demo alias is deprecated; use "
        "`python -m fairy_core_spark.cli run --input <csv>` instead.",
        file=sys.stderr,
    )
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", default="project_dir/reports")
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--kind", default="rna")
    old, _ = ap.parse_known_args()
    argv = ["run", "--input", old.input, "--out", old.out, "--kind", old.kind]
    if old.dry_run:
        argv.append("--dry-run")
    return main(argv)


def _version_text() -> str:
    """Top-level --version block (reference cli/run.py:116-124)."""
    from fairy_core_spark.plans.report import ENGINE_VERSION

    return "\n".join(
        [
            f"fairy_core_version: {ENGINE_VERSION}",
            "rulepack_name: default",
            "rulepack_version: 0.0.0",
            "rulepack_source_path: (built-in)",
        ]
    )


def cmd_pipeline(args) -> int:
    from fairy_core_spark.pipeline.runner import PipelineRunner, image_pipeline_stages

    spark = get_spark(app_name="fairy-pipeline", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    runner = PipelineRunner(spark, args.out_dir)
    status = runner.run(
        image_pipeline_stages(args.n_images, args.tile_level, args.cell_scheme)
    )
    print(json.dumps(status, sort_keys=True))
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    # top-level --version with no subcommand (reference cli/run.py:221-224)
    if argv == ["--version"]:
        print(_version_text())
        return 0
    ap = argparse.ArgumentParser(prog="fairy-core-spark")
    ap.add_argument("--master", default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="rulepack validation over named inputs")
    v.add_argument("input", nargs="?", default=None,
                   help="CSV file or folder of CSVs (legacy positional mode)")
    v.add_argument("--inputs", nargs="+", default=[], help="name=path pairs")
    v.add_argument("--rulepack", required=True)
    v.add_argument("--json-out", default=None)
    v.add_argument("--md-out", default=None)
    v.set_defaults(fn=cmd_validate)

    rp_p = sub.add_parser(
        "rulepack", help="load a YAML/JSON rulepack and validate its shape (no execution)"
    )
    rp_p.add_argument("--rulepack", required=True)
    rp_p.add_argument("--inputs", nargs="*", default=[], help="name=path pairs (echo only)")
    rp_p.set_defaults(fn=cmd_rulepack)

    p = sub.add_parser("preflight", help="GEO-style preflight over samples/files")
    p.add_argument("--rulepack", required=True)
    p.add_argument("--samples", required=True)
    p.add_argument("--files", required=True)
    p.add_argument("--out-dir", default=None)
    p.add_argument("--param-file", default=None)
    p.add_argument(
        "profile",
        nargs="?",
        default="geo",
        help="preflight profile id (geo | spellbook | generic; ADR-0007)",
    )
    p.set_defaults(fn=cmd_preflight)

    r = sub.add_parser("run", help="legacy v0 single-CSV summarize (registry validators)")
    r.add_argument("--input", required=True, help="CSV file, or folder with exactly one CSV")
    r.add_argument("--out", default="project_dir/reports", help="output dir for report.json/.md")
    r.add_argument("--dry-run", action="store_true", help="print the v0 payload JSON instead")
    r.add_argument("--kind", default="rna", help="registry validator kind: rna | generic | ...")
    r.set_defaults(fn=cmd_run)

    pl = sub.add_parser("pipeline", help="image validate->encode->join->tile job")
    pl.add_argument("--out-dir", required=True)
    pl.add_argument("--n-images", type=int, default=100_000)
    pl.add_argument("--tile-level", type=int, default=12)
    pl.add_argument("--cell-scheme", default="s2", choices=["s2", "hex7"])
    pl.set_defaults(fn=cmd_pipeline)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
