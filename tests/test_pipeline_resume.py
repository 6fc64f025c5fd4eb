"""Checkpoint-resume contract (SURVEY.md §5 item 4): a re-submitted job
skips completed stages via lineage fingerprints; outputs stay identical;
bumping a stage version forces recompute of that stage."""

from __future__ import annotations

import json

from fairy_core_spark.pipeline.runner import PipelineRunner, image_pipeline_stages
from fairy_core_spark.plans.provenance import table_fingerprint


def test_resume_skips_completed_stages(spark, tmp_path):
    out = str(tmp_path / "run")
    stages = image_pipeline_stages(n_images=200, tile_level=10)

    r1 = PipelineRunner(spark, out)
    s1 = r1.run(stages)
    assert all(v == "completed" for v in s1.values())
    tiles_snap_1 = r1.catalog.snapshot("tiles")["snapshot_id"]
    tiles_fp_1 = table_fingerprint(f"{out}/tiles/data")

    # resubmit: everything skips, outputs untouched
    r2 = PipelineRunner(spark, out)
    s2 = r2.run(image_pipeline_stages(n_images=200, tile_level=10))
    assert all(v == "skipped" for v in s2.values())
    assert r2.catalog.snapshot("tiles")["snapshot_id"] == tiles_snap_1
    assert table_fingerprint(f"{out}/tiles/data") == tiles_fp_1

    # lineage recorded both passes
    lines = [json.loads(x) for x in open(f"{out}/lineage.jsonl")]
    assert sum(1 for x in lines if x["status"] == "completed") == len(stages)
    assert sum(1 for x in lines if x["status"] == "skipped") == len(stages)

    # version bump (parameter change) invalidates only the changed stage +
    # its downstream consumers re-read fresh snapshots
    stages3 = image_pipeline_stages(n_images=200, tile_level=10)
    stages3[2].version = "2"  # validate stage logic changed
    r3 = PipelineRunner(spark, out)
    s3 = r3.run(stages3)
    assert s3["gen_images"] == "skipped"
    assert s3["validate"] == "completed"
