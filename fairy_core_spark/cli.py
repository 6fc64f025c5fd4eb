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


def cmd_validate(args) -> int:
    from fairy_core_spark.plans.report import (
        run_rulepack,
        write_report_json,
        write_report_markdown,
    )
    from fairy_core_spark.rulepack.loader import load_rulepack

    spark = get_spark(app_name="fairy-validate", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    rp = load_rulepack(args.rulepack)
    inputs = _parse_inputs(args.inputs)
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


def cmd_preflight(args) -> int:
    from fairy_core_spark.plans.preflight_report import run_preflight, write_preflight_outputs

    spark = get_spark(app_name="fairy-preflight", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    with open(args.rulepack) as f:
        rulepack = json.load(f) if args.rulepack.endswith(".json") else __import__("yaml").safe_load(f)
    params = {}
    if args.param_file:
        import yaml

        with open(args.param_file) as f:
            params = yaml.safe_load(f) or {}
    report = run_preflight(
        spark, rulepack, args.rulepack, args.samples, args.files, params=params
    )
    out_dir = args.out_dir or "."
    write_preflight_outputs(report, out_dir)

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


def cmd_pipeline(args) -> int:
    from fairy_core_spark.pipeline.runner import PipelineRunner, image_pipeline_stages

    spark = get_spark(app_name="fairy-pipeline", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    runner = PipelineRunner(spark, args.out_dir)
    status = runner.run(image_pipeline_stages(args.n_images, args.tile_level))
    print(json.dumps(status, sort_keys=True))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="fairy-core-spark")
    ap.add_argument("--master", default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="rulepack validation over named inputs")
    v.add_argument("--inputs", nargs="+", required=True, help="name=path pairs")
    v.add_argument("--rulepack", required=True)
    v.add_argument("--json-out", default=None)
    v.add_argument("--md-out", default=None)
    v.set_defaults(fn=cmd_validate)

    p = sub.add_parser("preflight", help="GEO-style preflight over samples/files")
    p.add_argument("--rulepack", required=True)
    p.add_argument("--samples", required=True)
    p.add_argument("--files", required=True)
    p.add_argument("--out-dir", default=None)
    p.add_argument("--param-file", default=None)
    p.set_defaults(fn=cmd_preflight)

    pl = sub.add_parser("pipeline", help="image validate->encode->join->tile job")
    pl.add_argument("--out-dir", required=True)
    pl.add_argument("--n-images", type=int, default=100_000)
    pl.add_argument("--tile-level", type=int, default=12)
    pl.set_defaults(fn=cmd_pipeline)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
